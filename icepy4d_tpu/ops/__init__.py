"""Device-side compute ops: pure-JAX, vmapped, statically shaped.

Every function here is differentiable/jit-compatible and replaces a
native-backed call in the reference (cv2.projectPoints, cv2.undistortPoints,
pydegensac RANSAC, pyfftw correlation, ...) with an idiomatic XLA program.
"""
