"""open_any / open_any_directory: local files, archive traversal, nesting,
and http(s) URLs served over loopback (no egress needed)."""
import io
import os
import tarfile
import threading
import zipfile
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler

import pytest

from wildgaussians_tpu.utils import open_any, open_any_directory


def test_plain_roundtrip(tmp_path):
    p = tmp_path / "sub" / "a.txt"
    with open_any(p, "w") as f:
        f.write(b"hello")
    with open_any(p, "r") as f:
        assert f.read() == b"hello"


def test_fileobj_passthrough():
    buf = io.BytesIO(b"xyz")
    with open_any(buf, "r") as f:
        assert f.read() == b"xyz"


def test_zip_read_write(tmp_path):
    zp = tmp_path / "arc.zip"
    with open_any(f"{zp}/dir/inner.bin", "w") as f:
        f.write(b"\x00\x01payload")
    with open_any(f"{zp}/dir/inner.bin", "r") as f:
        assert f.read() == b"\x00\x01payload"


def test_tar_read(tmp_path):
    tp = tmp_path / "arc.tar.gz"
    with tarfile.open(tp, "w:gz") as tf:
        data = b"tar-data"
        info = tarfile.TarInfo("d/x.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    with open_any(f"{tp}/d/x.txt", "r") as f:
        assert f.read() == b"tar-data"


def test_nested_zip_in_zip(tmp_path):
    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("leaf.txt", "deep")
    outer = tmp_path / "outer.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.writestr("mid/inner.zip", inner.getvalue())
    with open_any(f"{outer}/mid/inner.zip/leaf.txt", "r") as f:
        assert f.read() == b"deep"


@pytest.fixture()
def http_root(tmp_path):
    (tmp_path / "f.txt").write_bytes(b"remote content")
    with zipfile.ZipFile(tmp_path / "d.zip", "w") as zf:
        zf.writestr("inside/g.txt", "zipped remote")
        zf.writestr("inside/h.txt", "second file")
    handler = partial(SimpleHTTPRequestHandler, directory=str(tmp_path))
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_read(http_root):
    with open_any(f"{http_root}/f.txt", "r") as f:
        assert f.read() == b"remote content"


def test_http_zip_member(http_root):
    with open_any(f"{http_root}/d.zip/inside/g.txt", "r") as f:
        assert f.read() == b"zipped remote"


def test_http_write_rejected(http_root):
    with pytest.raises(AssertionError):
        with open_any(f"{http_root}/f.txt", "w"):
            pass


def test_http_directory(http_root):
    with open_any_directory(f"{http_root}/d.zip", "r") as d:
        assert sorted(os.listdir(os.path.join(d, "inside"))) == ["g.txt", "h.txt"]
