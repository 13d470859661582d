"""Native TIFF stack IO: roundtrip, cross-validation vs PIL, prefetcher."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from microtipi_tpu.io.tiffstack import StackPrefetcher, read_stack, stack_info, write_stack


def _vol(shape, seed=0):
    return np.random.default_rng(seed).random(shape).astype(np.float32) * 100


def test_roundtrip(tmp_path):
    v = _vol((7, 33, 41))
    p = tmp_path / "s.tif"
    write_stack(p, v)
    assert stack_info(p) == (7, 33, 41)
    back = read_stack(p)
    np.testing.assert_array_equal(back, v)


def test_partial_read(tmp_path):
    v = _vol((10, 16, 16), 1)
    p = tmp_path / "s.tif"
    write_stack(p, v)
    part = read_stack(p, z0=3, nz=4)
    np.testing.assert_array_equal(part, v[3:7])


def test_cross_validation_with_pil_reader(tmp_path):
    """Our writer's output must be readable by an independent decoder."""
    v = _vol((3, 20, 24), 2)
    p = tmp_path / "s.tif"
    write_stack(p, v)
    img = PIL.open(p)
    for z in range(3):
        img.seek(z)
        np.testing.assert_array_equal(np.asarray(img), v[z])


def test_reads_pil_written_uint16(tmp_path):
    """Our reader must decode third-party uint16 stacks (the common camera
    format), converting to float32."""
    rng = np.random.default_rng(3)
    pages = [rng.integers(0, 65535, (18, 22), dtype=np.uint16) for _ in range(4)]
    p = tmp_path / "u16.tif"
    PIL.fromarray(pages[0]).save(
        p, save_all=True, append_images=[PIL.fromarray(x) for x in pages[1:]]
    )
    got = read_stack(p)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, np.stack(pages).astype(np.float32))


def test_prefetcher_order_and_content(tmp_path):
    vols = [_vol((4, 8, 8), seed=s) for s in range(5)]
    paths = []
    for i, v in enumerate(vols):
        p = tmp_path / f"t{i}.tif"
        write_stack(p, v)
        paths.append(p)
    out = list(StackPrefetcher(paths, depth=3))
    assert [p for p, _ in out] == [str(p) for p in paths]
    for (_, got), want in zip(out, vols):
        np.testing.assert_array_equal(got, want)


def test_error_on_missing_file(tmp_path):
    with pytest.raises(IOError):
        stack_info(tmp_path / "nope.tif")


def test_prefetcher_is_reusable(tmp_path):
    vols = [_vol((2, 8, 8), seed=s) for s in range(3)]
    paths = []
    for i, v in enumerate(vols):
        p = tmp_path / f"r{i}.tif"
        write_stack(p, v)
        paths.append(p)
    pf = StackPrefetcher(paths, depth=2)
    first = list(pf)
    # break out mid-iteration, then iterate again from scratch
    for _, _ in pf:
        break
    second = list(pf)
    assert [p for p, _ in first] == [p for p, _ in second]
    for (_, a), (_, b) in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_hdf5_roundtrip(tmp_path):
    pytest.importorskip("h5py")
    from microtipi_tpu.io.hdf5stack import list_datasets, read_h5, write_h5

    v = _vol((6, 12, 14), 7)
    p = tmp_path / "v.h5"
    write_h5(p, v, dataset="stack")
    assert list_datasets(p) == ["stack"]
    np.testing.assert_array_equal(read_h5(p), v)
    np.testing.assert_array_equal(read_h5(p, "stack", z0=2, nz=3), v[2:5])
