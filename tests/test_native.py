"""Native host-runtime components: threaded EXIF scanner."""

import numpy as np
import pytest

from icepy4d_tpu.native import exif_scan_batch, native_available


def test_native_scanner_builds():
    # g++ is part of the toolchain; the scanner must build and load
    assert native_available()


def test_exif_batch_matches_pil(assets_dir):
    paths = sorted((assets_dir / "img" / "cam1").glob("*.jpg"))
    if not paths:
        pytest.skip("no sample jpegs")
    dts, focals = exif_scan_batch(paths)
    assert len(dts) == len(paths)
    assert all(d is not None for d in dts)
    assert np.isfinite(focals).all()

    from icepy4d_tpu.core.images import Image

    for p, d, f in zip(paths, dts, focals):
        im = Image(p)
        assert im.datetime == d


def test_exif_batch_handles_non_jpeg(tmp_path):
    bogus = tmp_path / "not_an_image.jpg"
    bogus.write_bytes(b"hello world, definitely not a jpeg")
    missing = tmp_path / "missing.jpg"
    dts, focals = exif_scan_batch([bogus, missing])
    assert dts == [None, None]
    assert np.isnan(focals).all()


def test_imageds_prescans_timestamps(assets_dir):
    from icepy4d_tpu.core.images import ImageDS

    ds = ImageDS(assets_dir / "img" / "cam2")
    # timestamps were set by the batch scanner without touching PIL
    assert all(im._datetime is not None for im in ds)
    ts = ds.timestamps()
    assert ts == sorted(ts)
