"""Native C++ loader: builds, matches the Python parser exactly, and
degrades gracefully."""
import numpy as np
import pytest

from fgoicp_tpu.native import build as nbuild
from fgoicp_tpu.native import loader as nloader


@pytest.fixture(scope="module")
def lib():
    path = nbuild.ensure_built(quiet=True)
    if path is None:
        pytest.skip("no native toolchain available")
    return path


def test_txt_exact_match(lib, tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(257, 3)).astype(np.float32)
    p = tmp_path / "cloud.txt"
    with open(p, "w") as f:
        f.write(f"{len(pts)}\n")
        for row in pts:
            f.write(f"{row[0]:.9g} {row[1]:.9g} {row[2]:.9g}\n")
    native = nloader.load_txt(str(p))
    assert native is not None
    from fgoicp_tpu.io import loader as pyloader
    orig = pyloader._native_loader
    pyloader._native_loader = None
    try:
        python = pyloader.load_cloud_txt(str(p))
    finally:
        pyloader._native_loader = orig
    np.testing.assert_array_equal(native, python)


def test_txt_extra_columns_ignored(lib, tmp_path):
    p = tmp_path / "cloud.txt"
    p.write_text("2 extra header tokens\n1 2 3 255 255 255\n4 5 6 0 0 0\n")
    pts = nloader.load_txt(str(p))
    np.testing.assert_array_equal(
        pts, np.array([[1, 2, 3], [4, 5, 6]], np.float32))


def test_malformed_returns_none(lib, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("5\n1 2 3\n")  # claims 5 rows, has 1
    assert nloader.load_txt(str(p)) is None
    p2 = tmp_path / "bad2.txt"
    p2.write_text("not-a-count\n")
    assert nloader.load_txt(str(p2)) is None
    assert nloader.load_txt(str(tmp_path / "missing.txt")) is None
