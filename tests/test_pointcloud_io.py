"""PLY / PCD / delimited-text IO (fpcr_tpu.data.pointcloud_io).

The reference exchanges clouds only as ad-hoc CSVs
(/root/reference/src/CUDA/GPU_point_to_point_bunny.cu:463-497); the rebuild
adds the standard interchange formats. These tests cover roundtrips in every
mode, cross-format agreement, header quirks, and an end-to-end registration
from files.
"""

import numpy as np
import pytest

import fpcr_tpu as f
from fpcr_tpu.data.pointcloud_io import (load_points, read_pcd, read_ply,
                                         write_pcd, write_ply)


@pytest.fixture
def cloud():
    rng = np.random.default_rng(7)
    return rng.normal(size=(257, 3)).astype(np.float32)


# ---------------------------------------------------------------- PLY

@pytest.mark.parametrize("binary", [False, True])
def test_ply_roundtrip(tmp_path, cloud, binary):
    path = tmp_path / "c.ply"
    write_ply(path, cloud, binary=binary, comment="roundtrip")
    pts, extras = read_ply(path)
    np.testing.assert_allclose(pts, cloud, rtol=0, atol=1e-6)
    assert extras == {}


@pytest.mark.parametrize("binary", [False, True])
def test_ply_roundtrip_with_normals(tmp_path, cloud, binary):
    normals = np.tile(np.float32([0, 0, 1]), (cloud.shape[0], 1))
    path = tmp_path / "cn.ply"
    write_ply(path, cloud, normals=normals, binary=binary)
    pts, extras = read_ply(path)
    np.testing.assert_allclose(pts, cloud, atol=1e-6)
    got = np.stack([extras["nx"], extras["ny"], extras["nz"]], axis=1)
    np.testing.assert_allclose(got, normals, atol=0)


def test_ply_big_endian_and_mixed_props(tmp_path):
    # hand-built: uchar color + double coords, big-endian
    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    red = np.array([7, 9], dtype=np.uint8)
    rec = np.dtype([("x", ">f8"), ("y", ">f8"), ("z", ">f8"), ("red", ">u1")])
    arr = np.zeros(2, dtype=rec)
    arr["x"], arr["y"], arr["z"], arr["red"] = pts[:, 0], pts[:, 1], pts[:, 2], red
    header = (b"ply\nformat binary_big_endian 1.0\n"
              b"element vertex 2\n"
              b"property double x\nproperty double y\nproperty double z\n"
              b"property uchar red\nend_header\n")
    path = tmp_path / "be.ply"
    path.write_bytes(header + arr.tobytes())
    got, extras = read_ply(path)
    np.testing.assert_allclose(got, pts, atol=1e-6)
    np.testing.assert_array_equal(extras["red"], red)


def test_ply_skips_leading_element_and_faces(tmp_path):
    # an element BEFORE vertex (ascii) + faces after: both ignored
    text = "\n".join([
        "ply", "format ascii 1.0",
        "comment exercised: non-vertex elements",
        "element junk 2", "property float a",
        "element vertex 2",
        "property float x", "property float y", "property float z",
        "element face 1", "property list uchar int vertex_indices",
        "end_header",
        "0.5", "0.25",                      # junk element rows
        "1 2 3", "4 5 6",                   # vertices
        "3 0 1 0",                          # face row
    ]) + "\n"
    path = tmp_path / "skip.ply"
    path.write_text(text)
    pts, _ = read_ply(path)
    np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])


def test_ply_binary_list_element_before_vertex(tmp_path):
    # binary face element BEFORE vertex must be skipped via its list lengths
    face = b"\x03" + np.array([0, 1, 2], "<i4").tobytes()
    vert = np.array([[1, 2, 3], [4, 5, 6]], "<f4").tobytes()
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element face 1\n"
              b"property list uchar int vertex_indices\n"
              b"element vertex 2\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"end_header\n")
    path = tmp_path / "fb.ply"
    path.write_bytes(header + face + vert)
    pts, _ = read_ply(path)
    np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])


def test_ply_errors(tmp_path, cloud):
    p = tmp_path / "bad.ply"
    p.write_bytes(b"not a ply\n")
    with pytest.raises(ValueError, match="magic"):
        read_ply(p)
    p.write_bytes(b"ply\nformat ascii 2.0\nend_header\n")
    with pytest.raises(ValueError, match="format"):
        read_ply(p)
    # missing z property
    p.write_text("ply\nformat ascii 1.0\nelement vertex 1\n"
                 "property float x\nproperty float y\nend_header\n1 2\n")
    with pytest.raises(ValueError, match="lacks property 'z'"):
        read_ply(p)
    # truncated binary payload
    q = tmp_path / "trunc.ply"
    write_ply(q, cloud, binary=True)
    q.write_bytes(q.read_bytes()[:-5])
    with pytest.raises(ValueError, match="truncated"):
        read_ply(q)
    with pytest.raises(ValueError, match=r"\[N,3\]"):
        write_ply(tmp_path / "x.ply", cloud[:, :2])
    with pytest.raises(ValueError, match="normals"):
        write_ply(tmp_path / "x.ply", cloud, normals=cloud[:-1])


# ---------------------------------------------------------------- PCD

@pytest.mark.parametrize("binary", [False, True])
def test_pcd_roundtrip(tmp_path, cloud, binary):
    path = tmp_path / "c.pcd"
    write_pcd(path, cloud, binary=binary)
    pts, extras = read_pcd(path)
    np.testing.assert_allclose(pts, cloud, rtol=0, atol=1e-6)
    assert extras == {}


def test_pcd_extra_fields_count_and_invalid_rows(tmp_path):
    # binary PCD: xyz + intensity, COUNT=1, one NaN row dropped by default
    pts = np.array([[1, 2, 3], [np.nan, 0, 0], [4, 5, 6]], dtype=np.float32)
    intensity = np.array([10, 20, 30], dtype=np.float32)
    rec = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                    ("intensity", "<f4")])
    arr = np.zeros(3, dtype=rec)
    arr["x"], arr["y"], arr["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    arr["intensity"] = intensity
    header = ("VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
              "TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH 3\nHEIGHT 1\n"
              "POINTS 3\nDATA binary\n")
    path = tmp_path / "i.pcd"
    path.write_bytes(header.encode() + arr.tobytes())
    got, extras = read_pcd(path)
    np.testing.assert_allclose(got, pts[[0, 2]])
    np.testing.assert_allclose(extras["intensity"], intensity[[0, 2]])
    got_all, _ = read_pcd(path, drop_invalid=False)
    assert got_all.shape == (3, 3)


def test_pcd_ascii_multicount_field(tmp_path):
    # a COUNT=2 field expands to name_0/name_1 columns
    header = ("# comment line\nVERSION 0.7\nFIELDS x y z pair\n"
              "SIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 2\n"
              "WIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA ascii\n")
    path = tmp_path / "m.pcd"
    path.write_text(header + "1 2 3 8 9\n4 5 6 10 11\n")
    pts, extras = read_pcd(path)
    np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_allclose(extras["pair_0"], [8, 10])
    np.testing.assert_allclose(extras["pair_1"], [9, 11])


def test_pcd_errors(tmp_path, cloud):
    p = tmp_path / "bad.pcd"
    p.write_text("VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                 "POINTS 1\nDATA binary_compressed\n")
    with pytest.raises(ValueError, match="binary_compressed"):
        read_pcd(p)
    p.write_text("VERSION 0.7\nFIELDS a b\nSIZE 4 4\nTYPE F F\n"
                 "POINTS 1\nDATA ascii\n1 2\n")
    with pytest.raises(ValueError, match="lacks field 'x'"):
        read_pcd(p)
    p.write_text("VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n")
    with pytest.raises(ValueError, match="DATA"):
        read_pcd(p)
    q = tmp_path / "trunc.pcd"
    write_pcd(q, cloud, binary=True)
    q.write_bytes(q.read_bytes()[:-4])
    with pytest.raises(ValueError, match="truncated"):
        read_pcd(q)


# ---------------------------------------------------------- load_points

def test_load_points_dispatch(tmp_path, cloud):
    write_ply(tmp_path / "c.ply", cloud)
    write_pcd(tmp_path / "c.pcd", cloud)
    np.savetxt(tmp_path / "c.csv", cloud, delimiter=",")
    np.savetxt(tmp_path / "semi.csv", cloud, delimiter=";")
    np.savetxt(tmp_path / "c.xyz", cloud, delimiter=" ")
    with open(tmp_path / "hdr.csv", "w") as fh:
        fh.write("x,y,z\n")
        np.savetxt(fh, cloud, delimiter=",")
    for name in ("c.ply", "c.pcd", "c.csv", "semi.csv", "c.xyz", "hdr.csv"):
        got = load_points(tmp_path / name)
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, cloud, atol=1e-5, err_msg=name)


def test_load_points_rejects_narrow(tmp_path):
    np.savetxt(tmp_path / "n.csv", np.zeros((4, 2)), delimiter=",")
    with pytest.raises(ValueError, match="3 columns"):
        load_points(tmp_path / "n.csv")


# ------------------------------------------------- end-to-end integration

def test_register_from_files(tmp_path):
    """Write a scene out as PLY+PCD, read it back, run ICP: the from-file
    path must recover the ground truth like the in-memory one."""
    scene = f.synthetic_scene(width=24)
    write_ply(tmp_path / "source.ply", np.asarray(scene.source))
    write_pcd(tmp_path / "target.pcd", np.asarray(scene.target))
    src = load_points(tmp_path / "source.ply")
    tgt = load_points(tmp_path / "target.pcd")
    res = f.icp_point_to_point(src, tgt,
                               config=f.ICPConfig(max_iterations=40))
    assert float(f.transform_rmse(res.transform, scene.ground_truth,
                                  src)) < 1e-4


def test_load_points_reads_reference_assets():
    """Both reference CSV dialects load through the generic path: semicolon
    Bunny.csv (35,947 pts) and space-separated Bunny_res.csv (8,171 pts) —
    reference loader /root/reference/src/CUDA/GPU_point_to_point_bunny.cu:463-497."""
    from fpcr_tpu.data.paths import asset

    full = load_points(asset("Bunny.csv"))
    res = load_points(asset("Bunny_res.csv"))
    assert full.shape == (35947, 3)
    assert res.shape == (8171, 3)
    assert np.isfinite(full).all() and np.isfinite(res).all()


@pytest.mark.parametrize("binary", [False, True])
def test_extras_roundtrip_both_formats(tmp_path, cloud, binary):
    """Per-point scalar properties (intensity etc.) survive write->read
    in both formats — pipelines can carry sensor channels through."""
    intensity = np.linspace(0, 100, cloud.shape[0]).astype(np.float32)
    ring = np.arange(cloud.shape[0]).astype(np.float32) % 16

    write_ply(tmp_path / "e.ply", cloud,
              extras={"intensity": intensity, "ring": ring}, binary=binary)
    pts, ex = read_ply(tmp_path / "e.ply")
    np.testing.assert_allclose(pts, cloud, atol=1e-6)
    np.testing.assert_allclose(ex["intensity"], intensity, atol=1e-4)
    np.testing.assert_allclose(ex["ring"], ring)

    write_pcd(tmp_path / "e.pcd", cloud,
              extras={"intensity": intensity}, binary=binary)
    pts2, ex2 = read_pcd(tmp_path / "e.pcd")
    np.testing.assert_allclose(pts2, cloud, atol=1e-6)
    np.testing.assert_allclose(ex2["intensity"], intensity, atol=1e-4)


def test_extras_shape_validation(tmp_path, cloud):
    with pytest.raises(ValueError, match="extra property"):
        write_ply(tmp_path / "b.ply", cloud,
                  extras={"bad": np.zeros(cloud.shape[0] - 1)})
    with pytest.raises(ValueError, match="extra property"):
        write_pcd(tmp_path / "b.pcd", cloud,
                  extras={"bad": np.zeros((cloud.shape[0], 2))})
