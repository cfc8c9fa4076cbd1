"""Least-squares Helmert / roto-translation estimation.

Ref src/icepy4d/least_squares/: lmfit-based 7-parameter similarity
residuals. Here the same parameterization — params = (rx, ry, rz, tx,
ty, tz, m) — with a jitted Gauss–Newton solver instead of lmfit.
"""

from icepy4d_tpu.least_squares.absolute_orientation import (  # noqa: F401
    compute_residuals,
    estimate_similarity_least_squares,
    get_T_from_params,
)
