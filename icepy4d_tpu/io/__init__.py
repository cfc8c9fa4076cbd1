"""IO / interchange: PLY, Bundler, COLMAP, CSV metric sinks."""

from icepy4d_tpu.io.ply import read_ply, write_ply

__all__ = ["read_ply", "write_ply"]
