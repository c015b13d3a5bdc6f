"""Native C++ tokenizers vs the numpy fallback path."""

import numpy as np
import pytest

from fpcr_tpu.utils import native


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native extension could not be built")
    return True


def test_native_read_xyz_whitespace(tmp_path, have_native):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(37, 3)).astype(np.float32)
    p = tmp_path / "pts.csv"
    p.write_text("\n".join(" ".join(f"{v:.7g}" for v in row) for row in data))
    got = native.read_xyz(str(p))
    np.testing.assert_allclose(got, data, rtol=1e-6)


def test_native_read_xyz_semicolon(tmp_path, have_native):
    data = np.array([[1.5, -2.25, 3.0], [0.125, 4.0, -8.5]], np.float32)
    p = tmp_path / "pts.csv"
    p.write_text("\n".join(";".join(str(v) for v in row) for row in data))
    np.testing.assert_allclose(native.read_xyz(str(p)), data)


def test_native_read_int_lines(tmp_path, have_native):
    vals = [130, 224, 245, 0, 65535, 7]
    p = tmp_path / "ints.csv"
    p.write_text("\n".join(str(v) for v in vals))
    np.testing.assert_array_equal(native.read_int_lines(str(p)), vals)


def test_native_missing_file(have_native):
    with pytest.raises(FileNotFoundError):
        native.read_xyz("/nonexistent/file.csv")


def test_native_matches_numpy_on_bunny(have_native):
    from fpcr_tpu.data.bunny import _parse_xyz_numpy
    from fpcr_tpu.data.paths import asset

    path = asset("Bunny_res.csv")
    np.testing.assert_allclose(
        native.read_xyz(str(path)), _parse_xyz_numpy(path), rtol=1e-6
    )


def test_native_matches_numpy_on_donut(have_native):
    from fpcr_tpu.data.paths import asset

    path = asset("Donut_1024x16.csv")
    got = native.read_int_lines(str(path))
    ref = np.array(path.read_text().split(), dtype=np.int64)
    np.testing.assert_array_equal(got, ref)


def test_native_speedup_on_donut(have_native):
    """The native parser should beat the Python fallback comfortably."""
    import time

    from fpcr_tpu.data.paths import asset

    path = str(asset("Donut_1024x16.csv"))
    native.read_int_lines(path)  # warm (build + page cache)

    def best_of(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # min-of-5 each: a single-shot comparison is scheduler-noise-dominated
    t_native = best_of(lambda: native.read_int_lines(path))
    t_py = best_of(
        lambda: np.array(open(path).read().split(), dtype=np.int64))
    assert t_native < t_py, (t_native, t_py)


def test_native_strict_error_contract(tmp_path):
    """The native tokenizers RAISE on bad input instead of returning a
    silently truncated/empty result (review find r3: a header line used to
    come back as an empty cloud with no error, diverging from the numpy
    fallback's ValueError)."""
    from fpcr_tpu.utils import native

    if not native.available():
        pytest.skip("native extension not built")
    hdr = tmp_path / "hdr.csv"
    hdr.write_text("x;y;z\n1;2;3\n")
    with pytest.raises(ValueError, match="unparsable token"):
        native.read_xyz(hdr)
    trailing = tmp_path / "trail.csv"
    trailing.write_text("1 2 3\n4 5 6\n# comment\n")
    with pytest.raises(ValueError, match="unparsable token"):
        native.read_xyz(trailing)
    big = tmp_path / "big.txt"
    big.write_text("1 2 99999999999999999999999\n")
    with pytest.raises(ValueError, match="out of range"):
        native.read_int_lines(big)
    missing = tmp_path / "nope.csv"
    with pytest.raises(FileNotFoundError):
        native.read_xyz(missing)
