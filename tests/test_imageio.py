import numpy as np
import pytest

from anatomask_tpu.imageio.nifti import NiftiIO, read_nifti, write_nifti
from anatomask_tpu.imageio.numpy_io import NumpyIO
from anatomask_tpu.imageio.registry import (
    determine_reader_writer_from_dataset_json,
    determine_reader_writer_from_file_ending,
    find_reader_writer_by_name,
)


def test_nifti_write_read_roundtrip(tmp_path, rng):
    data = rng.rand(7, 9, 11).astype(np.float32)
    f = str(tmp_path / "img.nii.gz")
    write_nifti(f, data, spacing_xyz=(1.5, 2.0, 2.5))
    back, hdr = read_nifti(f)
    np.testing.assert_allclose(back, data, rtol=1e-6)
    assert hdr["pixdim"][1:4] == pytest.approx((1.5, 2.0, 2.5))


def test_nifti_io_channels_and_spacing(tmp_path, rng):
    # write two channel files, read as multi-channel image
    vol = rng.rand(6, 8, 10).astype(np.float32)  # disk order (x, y, z)
    for c in range(2):
        write_nifti(str(tmp_path / f"case_{c:04d}.nii.gz"), vol + c, spacing_xyz=(1.0, 2.0, 3.0))
    io = NiftiIO()
    img, props = io.read_images([str(tmp_path / f"case_{c:04d}.nii.gz") for c in range(2)])
    assert img.shape == (2, 10, 8, 6)  # (c, z, y, x)
    assert props["spacing"] == pytest.approx([3.0, 2.0, 1.0])
    np.testing.assert_allclose(img[1] - img[0], 1.0, atol=1e-6)


def test_nifti_seg_roundtrip_preserves_geometry(tmp_path, rng):
    vol = (rng.rand(5, 6, 7) * 3).astype(np.float32)
    src = str(tmp_path / "img.nii.gz")
    write_nifti(src, vol, spacing_xyz=(0.7, 0.8, 0.9))
    io = NiftiIO()
    img, props = io.read_images([src])
    seg = (img[0] > 1).astype(np.uint8)
    out = str(tmp_path / "seg.nii.gz")
    io.write_seg(seg, out, props)
    seg_back, props_back = io.read_seg(out)
    np.testing.assert_array_equal(seg_back[0].astype(np.uint8), seg)
    assert props_back["spacing"] == pytest.approx(props["spacing"])


def test_nifti_scl_slope_applied(tmp_path, rng):
    import struct
    data = (rng.rand(4, 4, 4) * 100).astype(np.int16)
    f = str(tmp_path / "scaled.nii")
    write_nifti(f, data, spacing_xyz=(1, 1, 1))
    raw = bytearray(open(f, "rb").read())
    struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
    struct.pack_into("<f", raw, 116, 10.0)  # scl_inter
    open(f, "wb").write(bytes(raw))
    back, _ = read_nifti(f)
    np.testing.assert_allclose(back, data.astype(np.float32) * 2 + 10, rtol=1e-6)


def test_numpy_io_roundtrip(tmp_path, rng):
    arr = rng.rand(5, 6, 7).astype(np.float32)
    np.save(tmp_path / "case_0000.npy", arr)
    io = NumpyIO()
    img, props = io.read_images([str(tmp_path / "case_0000.npy")])
    assert img.shape == (1, 5, 6, 7)
    io.write_seg((img[0] > 0.5).astype(np.uint8), str(tmp_path / "seg.npy"), props)
    seg, _ = io.read_seg(str(tmp_path / "seg.npy"))
    assert seg.shape == (1, 5, 6, 7)


def test_registry():
    assert determine_reader_writer_from_file_ending(".nii.gz") is NiftiIO
    assert determine_reader_writer_from_file_ending(".npy") is NumpyIO
    from anatomask_tpu.imageio.registry import SitkLikeIO
    # nnU-Net alias: multi-format dispatcher (nii/mha/nrrd/mnc by ending)
    assert find_reader_writer_by_name("SimpleITKIO") is SitkLikeIO
    ds = {"file_ending": ".nii.gz"}
    assert determine_reader_writer_from_dataset_json(ds) is NiftiIO
    ds = {"file_ending": ".nii.gz", "overwrite_image_reader_writer": "NumpyIO"}
    assert determine_reader_writer_from_dataset_json(ds) is NumpyIO


def test_natural_image_2d_io(tmp_path, rng):
    from PIL import Image
    from anatomask_tpu.imageio.natural_image import NaturalImage2DIO
    arr = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
    f = str(tmp_path / "img.png")
    Image.fromarray(arr).save(f)
    io = NaturalImage2DIO()
    img, props = io.read_images([f])
    assert img.shape == (3, 1, 10, 12)  # RGB -> 3 channels, (c, 1, H, W)
    seg = (img[0] > 128).astype(np.uint8)
    out = str(tmp_path / "seg.png")
    io.write_seg(seg, out, props)
    back, _ = io.read_seg(out)
    np.testing.assert_array_equal(back[0], seg)
    from anatomask_tpu.imageio.registry import determine_reader_writer_from_file_ending
    assert determine_reader_writer_from_file_ending(".png") is NaturalImage2DIO


def test_tiff_3d_io(tmp_path, rng):
    from anatomask_tpu.imageio.tiff_io import Tiff3DIO
    vol = (rng.rand(5, 8, 9) * 200).astype(np.uint8)
    from PIL import Image
    frames = [Image.fromarray(s) for s in vol]
    f = str(tmp_path / "case_0000.tif")
    frames[0].save(f, save_all=True, append_images=frames[1:])
    import json
    with open(str(tmp_path / "case_0000.json"), "w") as fh:
        json.dump({"spacing": [2.0, 1.0, 1.0]}, fh)
    io = Tiff3DIO()
    img, props = io.read_images([f])
    assert img.shape == (1, 5, 8, 9)
    assert props["spacing"] == [2.0, 1.0, 1.0]
    seg = (img[0] > 100).astype(np.uint8)
    out = str(tmp_path / "seg.tif")
    io.write_seg(seg, out, props)
    back, props2 = io.read_seg(out)
    np.testing.assert_array_equal(back[0], seg)
    assert props2["spacing"] == [2.0, 1.0, 1.0]


def test_reorient_io_roundtrip(tmp_path):
    """NiftiIOWithReorient: a flipped/permuted (non-RAS) volume reads as the
    RAS-aligned array, and write_seg restores the ORIGINAL orientation and
    affine exactly (reference NibabelIOWithReorient contract)."""
    import numpy as np
    from anatomask_tpu.imageio.nifti import (
        NiftiIO, NiftiIOWithReorient, read_nifti, write_nifti,
    )
    rng = np.random.RandomState(3)
    disk = (rng.rand(5, 6, 7) * 40).astype(np.float32)  # scanner voxel order

    # non-RAS affine: world = A @ index; voxel axis 0 -> +z, 1 -> -y, 2 -> -x
    A = np.zeros((4, 4)); A[3, 3] = 1
    A[0, 2] = -1.3
    A[1, 1] = -0.7
    A[2, 0] = 2.0
    A[:3, 3] = (10., 20., 30.)
    f = str(tmp_path / "weird.nii.gz")
    write_nifti(f, np.ascontiguousarray(disk), affine=A)

    io_r = NiftiIOWithReorient()
    img, props = io_r.read_images([f])
    # RAS volume derived from the affine: x' <- flipped axis 2, y' <- flipped
    # axis 1, z' <- axis 0
    vol_ras = np.ascontiguousarray(
        np.flip(np.transpose(disk, (2, 1, 0)), axis=(0, 1)))
    got = img[0]
    expect = vol_ras.transpose(2, 1, 0)  # reader returns (z, y, x) axes
    np.testing.assert_allclose(got, expect, atol=1e-5)
    # spacing reordered to world (z, y, x) = (2.0, 0.7, 1.3)
    np.testing.assert_allclose(props["spacing"], [2.0, 0.7, 1.3], atol=1e-6)

    # write a seg in RAS; on disk it must match the original orientation
    seg_ras = (vol_ras > 20).astype(np.uint8).transpose(2, 1, 0)  # (z,y,x)
    out = str(tmp_path / "seg.nii.gz")
    io_r.write_seg(seg_ras, out, props)
    seg_disk, h = read_nifti(out)
    expect_disk = (disk > 20).astype(np.uint8)
    np.testing.assert_array_equal(seg_disk, expect_disk)
    np.testing.assert_allclose(h["affine"], A, atol=1e-5)


def test_plain_reader_warns_on_noncanonical(tmp_path, capsys):
    import numpy as np
    from anatomask_tpu.imageio import nifti as nifti_mod
    from anatomask_tpu.imageio.nifti import NiftiIO, write_nifti
    A = np.diag([-1.0, 1.0, 1.0, 1.0])  # L-flip
    f = str(tmp_path / "flip.nii.gz")
    write_nifti(f, np.zeros((4, 4, 4), np.float32), affine=A)
    nifti_mod._WARNED_NONCANONICAL = False
    NiftiIO().read_images([f])
    out = capsys.readouterr().out
    assert "not in canonical" in out


def test_registry_reorient_alias():
    from anatomask_tpu.imageio.nifti import NiftiIOWithReorient
    from anatomask_tpu.imageio.registry import find_reader_writer_by_name
    assert find_reader_writer_by_name("NibabelIOWithReorient") is NiftiIOWithReorient
    assert find_reader_writer_by_name("NiftiIOWithReorient") is NiftiIOWithReorient


def test_mha_roundtrip(tmp_path):
    import numpy as np
    from anatomask_tpu.imageio.meta_image import MetaImageIO, read_mha, write_mha
    rng = np.random.RandomState(5)
    vol = (rng.rand(6, 7, 8) * 100).astype(np.float32)  # (x, y, z)
    f = str(tmp_path / "t.mha")
    write_mha(f, vol, spacing_xyz=(1.5, 2.0, 2.5))
    data, h = read_mha(f)
    np.testing.assert_allclose(data, vol, atol=1e-6)
    assert h["spacing_xyz"] == (1.5, 2.0, 2.5)

    io = MetaImageIO()
    img, props = io.read_images([f])
    assert img.shape == (1, 8, 7, 6)          # (c, z, y, x)
    assert props["spacing"] == [2.5, 2.0, 1.5]
    seg = (img[0] > 50).astype(np.uint8)
    out = str(tmp_path / "seg.mha")
    io.write_seg(seg, out, props)
    seg_back, props2 = io.read_seg(out)
    np.testing.assert_array_equal(seg_back[0], seg)
    assert props2["spacing"] == [2.5, 2.0, 1.5]


def test_nrrd_roundtrip(tmp_path):
    import numpy as np
    from anatomask_tpu.imageio.meta_image import MetaImageIO, read_nrrd, write_nrrd
    rng = np.random.RandomState(6)
    vol = (rng.rand(5, 6, 7) * 50).astype(np.float32)
    f = str(tmp_path / "t.nrrd")
    write_nrrd(f, vol, spacing_xyz=(1.0, 1.25, 2.0))
    data, h = read_nrrd(f)
    np.testing.assert_allclose(data, vol, atol=1e-6)
    np.testing.assert_allclose(h["spacing_xyz"], (1.0, 1.25, 2.0))

    io = MetaImageIO()
    img, props = io.read_images([f])
    assert img.shape == (1, 7, 6, 5)
    seg = (img[0] > 25).astype(np.uint8)
    out = str(tmp_path / "seg.nrrd")
    io.write_seg(seg, out, props)
    seg_back, _ = io.read_seg(out)
    np.testing.assert_array_equal(seg_back[0], seg)


def test_meta_image_registry(tmp_path):
    from anatomask_tpu.imageio.meta_image import MetaImageIO
    from anatomask_tpu.imageio.registry import determine_reader_writer_from_file_ending
    assert determine_reader_writer_from_file_ending(".mha") is MetaImageIO
    assert determine_reader_writer_from_file_ending(".nrrd") is MetaImageIO


def test_minc_roundtrip(tmp_path, rng):
    from anatomask_tpu.imageio.minc_io import MincIO, read_minc, write_minc
    seg = rng.randint(0, 4, (7, 6, 5)).astype(np.uint8)
    props = {"spacing": [1.5, 2.0, 2.5],
             "minc_dims": {
                 "xspace": {"step": 1.5, "start": -3.0, "direction_cosines": [1, 0, 0]},
                 "yspace": {"step": 2.0, "start": 1.0, "direction_cosines": [0, 1, 0]},
                 "zspace": {"step": -2.5, "start": 9.0, "direction_cosines": [0, 0, 1]},
             }}
    f = str(tmp_path / "t.mnc")
    MincIO().write_seg(seg, f, props)
    data, p = MincIO().read_seg(f)
    np.testing.assert_array_equal(data[0], seg)
    assert p["spacing"] == [1.5, 2.0, 2.5]  # |step| per (x, y, z)
    assert p["minc_dims"]["zspace"]["start"] == 9.0  # geometry round-trips
    # raw reader agrees
    d2, p2 = read_minc(f)
    np.testing.assert_array_equal(d2, seg)


def test_minc_integer_rescale(tmp_path):
    """Integer volumes with per-z-slice image-min/image-max are rescaled to
    real values (MINC2 hyperslab scaling)."""
    import h5py
    from anatomask_tpu.imageio.minc_io import read_minc
    stored = np.arange(2 * 3 * 4, dtype=np.uint16).reshape(2, 3, 4)  # z,y,x
    f = str(tmp_path / "scaled.mnc")
    with h5py.File(f, "w") as h:
        root = h.create_group("minc-2.0")
        dgrp = root.create_group("dimensions")
        for i, name in enumerate(("zspace", "yspace", "xspace")):
            g = dgrp.create_group(name)
            g.attrs["step"] = 1.0
            g.attrs["start"] = 0.0
            g.attrs["length"] = stored.shape[i]
        img = root.create_group("image").create_group("0")
        ds = img.create_dataset("image", data=stored)
        ds.attrs["dimorder"] = "zspace,yspace,xspace"
        ds.attrs["valid_range"] = np.array([0, 65535], np.float64)
        img.create_dataset("image-min", data=np.array([0.0, 10.0]))
        img.create_dataset("image-max", data=np.array([65535.0, 65545.0]))
    data, props = read_minc(f)
    # slice z=0: identity scaling; slice z=1: +10 offset
    expect = stored.astype(np.float32)
    expect[1] += 10.0
    np.testing.assert_allclose(data.transpose(2, 1, 0), expect, atol=1e-3)


def test_minc_in_registry():
    from anatomask_tpu.imageio.minc_io import MincIO
    from anatomask_tpu.imageio.registry import (
        determine_reader_writer_from_file_ending, find_reader_writer_by_name)
    assert determine_reader_writer_from_file_ending(".mnc") is MincIO
    assert find_reader_writer_by_name("MincIO") is MincIO


def test_simpleitkio_alias_dispatches_by_ending(tmp_path, rng):
    """A dataset.json naming SimpleITKIO with .mha/.mnc files must route to
    the right native backend (the reference backend is multi-format)."""
    from anatomask_tpu.imageio.registry import find_reader_writer_by_name
    io = find_reader_writer_by_name("SimpleITKIO")()
    seg = rng.randint(0, 3, (5, 6, 7)).astype(np.uint8)
    for ending in (".mha", ".mnc"):
        f = str(tmp_path / ("x" + ending))
        io.write_seg(seg, f, {"spacing": [1.0, 1.0, 1.0]})
        data, props = io.read_seg(f)
        np.testing.assert_array_equal(data[0], seg)
