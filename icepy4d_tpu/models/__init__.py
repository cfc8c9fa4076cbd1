"""Neural feature extraction + matching models, TPU-native.

Pure JAX/flax re-designs of the reference's vendored torch models
(ref thirdparty/SuperGlue/models/*, thirdparty/LightGlue/lightglue/*):

  * SuperPoint — CNN detector/descriptor, batched NHWC, static top-K
  * LightGlue  — rotary-posenc transformer matcher, static depth + masks
  * SuperGlue  — attention GNN + Sinkhorn optimal transport matcher

Architectures are parameter-compatible with the reference checkpoints:
`convert.load_torch_superpoint/superglue/lightglue` map torch state
dicts onto our param pytrees (no torch at inference time).
"""

from icepy4d_tpu.models.superpoint import SuperPoint, superpoint_init  # noqa: F401

try:  # present once the matcher models land
    from icepy4d_tpu.models.lightglue import LightGlue, lightglue_init  # noqa: F401
    from icepy4d_tpu.models.superglue import SuperGlue, superglue_init  # noqa: F401
except ImportError:  # pragma: no cover
    pass
from icepy4d_tpu.models.disk import DISK, disk_init  # noqa: F401
