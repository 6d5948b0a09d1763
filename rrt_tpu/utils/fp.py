"""Floating-point error-bound machinery (PBRT-style conservative intersection).

The reference keeps a conservative pad on the BVH slab test so that rays
grazing an AABB face are never incorrectly culled (reference: src/fp.rs:12-19,
src/acceleration.rs:78). We keep the same constants so the flattened-BVH
traversal kernel is conservative in exactly the same way.
"""

import numpy as np

# Unit roundoff (half of the float32 "epsilon" step from 1.0) — the numerical
# analysis definition used by PBRT, not the C/Rust EPSILON constant.
MACHINE_EPSILON = float(np.finfo(np.float32).eps) * 0.5


def gamma_eb(n: int) -> float:
    """Tight bound for the relative error of n chained (1 +/- eps) factors."""
    ne = n * MACHINE_EPSILON
    return ne / (1.0 - ne)


# Multiplier applied to the slab-test far intersection distance so the AABB
# test is conservative under float rounding.
AABB_T_FAR_PAD = 1.0 + 2.0 * gamma_eb(3)
