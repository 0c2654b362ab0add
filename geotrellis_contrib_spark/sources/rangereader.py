"""Range-reader transport for the GeoTiff catalog: local files and
HTTP ranged GETs behind one interface.

Reference parity: geotrellis-contrib opens every tiff through a
streaming ``RangeReader`` (``GeoTiffRasterSource.scala:45-46`` —
``RangeReader(dataPath.value)`` resolves file/HTTP/S3 by URI scheme),
and its signature integration test reads a NASA COG over HTTP/S3 with
ranged GETs only (``gdal/src/it/scala/geotrellis/contrib/vlm/
SubsceneReadingIT.scala:36-38``). This module re-expresses that
contract for the PySpark engine:

  * ``FileRangeReader`` / ``HttpRangeReader`` — ``read(offset, n)``
    primitives. The HTTP reader sends ``Range: bytes=a-b`` and FAILS
    LOUD on a 200 response (a server that ignores Range would silently
    ship whole objects — at 100 TB that is the difference between a
    ranged-GET plan and downloading the archive).
  * ``BlockCachedFile`` — a seekable file-like over a RangeReader with
    block-aligned caching (default 32 KiB, the GDAL ``/vsicurl/``
    convention). Header/IFD parsing does hundreds of tiny seeks; the
    cache turns them into ONE ranged GET on a COG (whose IFD chain is
    up front) and a handful on classic layouts (one per end-of-file
    IFD block).
  * ``fetch_ranges`` — coalesced data-plane fetch: sorts the pruned
    tile byte ranges, merges runs closer than ``gap`` bytes, issues
    one ranged read per run and slices tiles back out. Adjacent tiles
    in file order cost one GET, and duplicate ranges (chunky multi-band
    catalogs list the same segment once per band) are fetched once.
  * ``serve_directory`` — a stdlib ``ThreadingHTTPServer`` that
    honours Range requests and LOGS every request (path, start, end,
    ranged?), so tests and oracle gates can assert the access pattern
    itself: header = 1 small GET on a COG, data = one GET per merged
    run, zero full-body GETs. (Stdlib ``SimpleHTTPRequestHandler``
    ignores Range, hence the from-scratch handler.)

No sockets leave localhost anywhere in this repo: the server exists so
the ranged-GET pattern is provable hermetically, mirroring what the
reference can only prove with live S3.
"""

from __future__ import annotations

import os
import struct  # noqa: F401  (re-exported convenience for callers)
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

DEFAULT_BLOCK = 32768
DEFAULT_GAP = 65536


class FileRangeReader:
    """Ranged reads over a local file (seek+read)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self.requests: list[tuple[int, int]] = []

    def read(self, offset: int, nbytes: int) -> bytes:
        self.requests.append((offset, nbytes))
        self._f.seek(offset)
        return self._f.read(nbytes)

    def size(self) -> int:
        return os.path.getsize(self.path)

    def close(self) -> None:
        self._f.close()


class HttpRangeReader:
    """Ranged reads over HTTP. One GET with ``Range: bytes=a-b`` per
    call; requires a 206 (fail-loud if the server ignores Range and
    returns 200 — silent whole-object downloads must never pass as a
    ranged plan). 416 beyond EOF returns b'' (the block cache probes
    past the end on classic-layout tails)."""

    def __init__(self, url: str, timeout: float = 30.0):
        self.url = url
        self.timeout = timeout
        self.requests: list[tuple[int, int]] = []

    def read(self, offset: int, nbytes: int) -> bytes:
        if nbytes <= 0:
            return b""
        self.requests.append((offset, nbytes))
        req = urllib.request.Request(
            self.url,
            headers={"Range": f"bytes={offset}-{offset + nbytes - 1}"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                if r.status == 200:
                    raise ValueError(
                        f"server ignored Range for {self.url}: got 200 "
                        "(whole object) instead of 206 — refusing to "
                        "read unranged")
                if r.status != 206:
                    raise ValueError(
                        f"unexpected status {r.status} for ranged GET "
                        f"{self.url}")
                return r.read()
        except urllib.error.HTTPError as e:
            if e.code == 416:  # requested range entirely past EOF
                return b""
            raise

    def size(self) -> int:
        req = urllib.request.Request(self.url, method="HEAD")
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return int(r.headers["Content-Length"])

    def close(self) -> None:
        pass


def open_range_reader(uri: str):
    """Scheme dispatch, mirroring the reference's RangeReader.apply:
    http(s):// -> HttpRangeReader, anything else -> local file."""
    if uri.startswith("http://") or uri.startswith("https://"):
        return HttpRangeReader(uri)
    return FileRangeReader(uri)


class BlockCachedFile:
    """Seekable read-only file-like over a RangeReader with
    block-aligned caching. Small scattered header reads coalesce into
    whole-block ranged GETs; contiguous missing blocks in one read()
    span fetch as a single GET."""

    def __init__(self, reader, block: int = DEFAULT_BLOCK):
        self._r = reader
        self._block = int(block)
        self._cache: dict[int, bytes] = {}
        self._eof_block: int | None = None  # index of the short block
        self._pos = 0

    # -- file-like surface used by the TIFF parser ----------------------
    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        else:
            raise ValueError("SEEK_END unsupported (size unknown)")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n < 0:
            raise ValueError("unbounded read() unsupported over ranges")
        if n == 0:
            return b""
        b = self._block
        b0, b1 = self._pos // b, (self._pos + n - 1) // b
        self._ensure(b0, b1)
        out = bytearray()
        pos, want = self._pos, n
        for bi in range(b0, b1 + 1):
            blk = self._cache.get(bi)
            if blk is None:  # past EOF
                break
            off = pos - bi * b
            take = blk[off:off + want]
            out += take
            pos += len(take)
            want -= len(take)
            if want <= 0 or len(blk) < b:  # done, or short (EOF) block
                break
        self._pos = pos
        return bytes(out)

    def close(self) -> None:
        self._r.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # -- block plumbing --------------------------------------------------
    def _ensure(self, b0: int, b1: int) -> None:
        if self._eof_block is not None:
            b1 = min(b1, self._eof_block)
        missing = [i for i in range(b0, b1 + 1) if i not in self._cache]
        run_start = None
        prev = None
        runs = []
        for i in missing:
            if run_start is None:
                run_start = prev = i
            elif i == prev + 1:
                prev = i
            else:
                runs.append((run_start, prev))
                run_start = prev = i
        if run_start is not None:
            runs.append((run_start, prev))
        for r0, r1 in runs:
            nreq = (r1 - r0 + 1) * self._block
            data = self._r.read(r0 * self._block, nreq)
            for j in range(r1 - r0 + 1):
                chunk = data[j * self._block:(j + 1) * self._block]
                self._cache[r0 + j] = chunk
                if len(chunk) < self._block:
                    self._eof_block = r0 + j
                    break


def open_header_stream(uri: str, block: int = DEFAULT_BLOCK):
    """File-like for header/IFD parsing. Local paths use a plain
    ``open`` (seeks are free); remote URIs get the block cache so a
    COG header costs ONE ranged GET."""
    if uri.startswith("http://") or uri.startswith("https://"):
        return BlockCachedFile(HttpRangeReader(uri), block=block)
    return open(uri, "rb")


def fetch_ranges(reader, ranges, gap: int = DEFAULT_GAP
                 ) -> dict[tuple[int, int], bytes]:
    """Coalesced data-plane fetch: merge byte ranges whose gaps are
    <= ``gap`` into runs, one ``reader.read`` per run, slice each
    requested (offset, nbytes) back out. Duplicate ranges fetch once.
    Fail-loud on short reads (a truncated tile must never decode)."""
    uniq = sorted(set((int(o), int(n)) for o, n in ranges))
    out: dict[tuple[int, int], bytes] = {}
    i = 0
    while i < len(uniq):
        run_off = uniq[i][0]
        run_end = uniq[i][0] + uniq[i][1]
        j = i + 1
        while j < len(uniq) and uniq[j][0] <= run_end + gap:
            run_end = max(run_end, uniq[j][0] + uniq[j][1])
            j += 1
        blob = reader.read(run_off, run_end - run_off)
        if len(blob) != run_end - run_off:
            raise ValueError(
                f"short ranged read at {run_off}: got {len(blob)} of "
                f"{run_end - run_off} bytes")
        for off, n in uniq[i:j]:
            out[(off, n)] = blob[off - run_off:off - run_off + n]
        i = j
    return out


# ---------------------------------------------------------------------------
# Hermetic Range-honouring HTTP server (test/fixture transport)
# ---------------------------------------------------------------------------


class _RangeServer(ThreadingHTTPServer):
    daemon_threads = True
    allow_reuse_address = True
    root: str = "."
    request_log: list


class _RangeHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def _resolve(self):
        rel = os.path.normpath(self.path.lstrip("/"))
        if rel.startswith("..") or os.path.isabs(rel):
            return None
        p = os.path.join(self.server.root, rel)
        return p if os.path.isfile(p) else None

    def do_HEAD(self):  # noqa: N802 (stdlib handler naming)
        p = self._resolve()
        if p is None:
            self.send_error(404)
            return
        self.server.request_log.append(
            {"path": self.path, "method": "HEAD", "start": None,
             "end": None, "ranged": False})
        self.send_response(200)
        self.send_header("Content-Length", str(os.path.getsize(p)))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):  # noqa: N802
        p = self._resolve()
        if p is None:
            self.send_error(404)
            return
        size = os.path.getsize(p)
        rng = self.headers.get("Range")
        if rng is None:
            self.server.request_log.append(
                {"path": self.path, "method": "GET", "start": 0,
                 "end": size - 1, "ranged": False})
            with open(p, "rb") as f:
                body = f.read()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if not rng.startswith("bytes=") or "," in rng:
            self.send_error(400, "unsupported Range")
            return
        spec = rng[len("bytes="):]
        lo_s, _, hi_s = spec.partition("-")
        if lo_s == "":
            self.send_error(400, "suffix ranges unsupported")
            return
        lo = int(lo_s)
        hi = int(hi_s) if hi_s else size - 1
        if lo >= size:
            self.send_response(416)
            self.send_header("Content-Range", f"bytes */{size}")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        hi = min(hi, size - 1)
        self.server.request_log.append(
            {"path": self.path, "method": "GET", "start": lo, "end": hi,
             "ranged": True})
        with open(p, "rb") as f:
            f.seek(lo)
            body = f.read(hi - lo + 1)
        self.send_response(206)
        self.send_header("Content-Range", f"bytes {lo}-{hi}/{size}")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence stderr chatter
        pass


def serve_directory(root: str):
    """Start a daemon Range-honouring HTTP server over ``root`` on an
    ephemeral localhost port. Returns (server, base_url); the server
    exposes ``request_log`` (every request with byte range and whether
    it was ranged) and ``shutdown()``."""
    srv = _RangeServer(("127.0.0.1", 0), _RangeHandler)
    srv.root = os.path.abspath(root)
    srv.request_log = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    return srv, f"http://{host}:{port}"
