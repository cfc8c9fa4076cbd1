"""Native (C++) host-runtime components.

The TPU compute path is JAX/XLA; the host runtime around it (metadata
scanning, data loading) is native where the workload is IO/parse bound:

- exif_scan: threaded batch JPEG-EXIF scanner (native/exif_scan.cpp),
  used by EpochDataMap to timestamp a whole season in one call instead
  of a per-image python parse loop.

The shared library is compiled on first use with g++ (cached next to
the source); every caller falls back to the PIL path when a compiler
is unavailable.
"""

from icepy4d_tpu.native.exif import exif_scan_batch, native_available  # noqa: F401
