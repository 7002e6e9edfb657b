"""external:// dataset download over loopback HTTP: fake UBC tarball ->
download_phototourism_dataset -> load_dataset end-to-end (no egress)."""
import os
import tarfile
import threading
import zipfile  # noqa: F401  (parallel with test_utils_io style)
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler

import numpy as np
import pytest

from tests.test_datasets_cli import make_colmap_scene


@pytest.fixture()
def rng():
    return np.random.default_rng(11)


@pytest.fixture()
def ubc_server(tmp_path, rng):
    """Serve trevi_fountain.tar.gz (scene under <stem>/dense/) + a tsv."""
    scene_dir = tmp_path / "scene"
    scene_dir.mkdir()
    make_colmap_scene(scene_dir, rng, n_cams=10)
    web = tmp_path / "web"
    web.mkdir()
    with tarfile.open(web / "trevi_fountain.tar.gz", "w:gz") as tf:
        tf.add(scene_dir, arcname="trevi_fountain/dense")
        # stereo/ junk outside dense/ must be ignored by the extractor
        tf.add(scene_dir / "sparse", arcname="trevi_fountain/stereo")
    names = sorted(os.listdir(scene_dir / "images"))
    lines = ["filename\tid\tsplit\tdataset"]
    for i, n in enumerate(names):
        lines.append(f"{n}\t{i}\t{'test' if i % 5 == 0 else 'train'}\ttrevi")
    (web / "trevi.tsv").write_text("\n".join(lines) + "\n")
    handler = partial(SimpleHTTPRequestHandler, directory=str(web))
    srv = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", len(names)
    srv.shutdown()


def test_external_download_and_load(ubc_server, tmp_path, monkeypatch):
    from wildgaussians_tpu.datasets import phototourism as pt
    from wildgaussians_tpu.datasets import load_dataset

    root, n_images = ubc_server
    monkeypatch.setitem(pt._phototourism_downloads, "trevi-fountain",
                        f"{root}/trevi_fountain.tar.gz")
    monkeypatch.setitem(pt._split_lists, "trevi-fountain", f"{root}/trevi.tsv")
    monkeypatch.setenv("WG_PREFIX", str(tmp_path / "cache"))

    train = load_dataset("external://phototourism/trevi-fountain", split="train")
    test = load_dataset("external://phototourism/trevi-fountain", split="test")
    local = tmp_path / "cache" / "datasets" / "phototourism" / "trevi-fountain"
    assert (local / "sparse" / "cameras.bin").exists()
    assert (local / "nerfw_split.csv").exists()
    assert not (local / "stereo").exists()   # non-dense members skipped
    n_test = (n_images + 4) // 5
    assert len(test["image_paths"]) == n_test
    assert len(train["image_paths"]) == n_images - n_test
    assert train["metadata"]["evaluation_protocol"] == "nerfw"

    # second load is served from the cache (kill the server to prove it)
    again = load_dataset("external://phototourism/trevi-fountain", split="train")
    assert again["image_paths"] == train["image_paths"]


def test_download_to_cache(tmp_path, monkeypatch):
    """Weight-download helper: fetch + cache hit + offline gate."""
    from wildgaussians_tpu.utils import download_to_cache

    web = tmp_path / "web"
    web.mkdir()
    (web / "w.pth").write_bytes(b"\x01\x02weights")
    handler = partial(SimpleHTTPRequestHandler, directory=str(web))
    srv = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/w.pth"
    cache = tmp_path / "cache"
    try:
        monkeypatch.delenv("WG_OFFLINE", raising=False)
        p = download_to_cache(url, cache_dir=str(cache))
        assert p is not None and open(p, "rb").read() == b"\x01\x02weights"
        # 404 -> None, no partial file left behind
        assert download_to_cache(url + ".missing", cache_dir=str(cache)) is None
        assert sorted(os.listdir(cache)) == ["w.pth"]
    finally:
        srv.shutdown()
    # cache hit must not touch the network (server is down)
    assert download_to_cache(url, cache_dir=str(cache)) == p
    monkeypatch.setenv("WG_OFFLINE", "1")
    assert download_to_cache(url + "2", cache_dir=str(cache)) is None


def test_download_rejects_unknown_scene(tmp_path):
    from wildgaussians_tpu.datasets.common import DatasetNotFoundError
    from wildgaussians_tpu.datasets.phototourism import (
        download_phototourism_dataset)
    with pytest.raises(DatasetNotFoundError):
        download_phototourism_dataset("phototourism/not-a-scene", tmp_path / "x")
    with pytest.raises(DatasetNotFoundError):
        download_phototourism_dataset("other/route", tmp_path / "y")
