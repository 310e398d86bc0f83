"""Import the reference torch models on CPU by stubbing the CUDA JIT extension loader.

The reference JIT-compiles CUDA at import time (torch.utils.cpp_extension.load); on a
CPU-only box that raises. All reference modules have CPU fallback *execution* paths
(fused_leaky_relu checks device, upfirdn2d has a native path), so patching the loader
with a dummy yields fully functional CPU reference models — the strongest possible
oracle for weight-conversion parity tests.
"""

import sys
import types

_REF = "/root/reference"


def load_reference_gans():
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import torch.utils.cpp_extension as cppext

    orig = cppext.load
    cppext.load = lambda *a, **k: types.SimpleNamespace(
        fused_bias_act=None, upfirdn2d=None
    )
    try:
        from gans.models import builder  # noqa: F401
        from gans.models import base, dusty_v1, dusty_v2, vanilla  # noqa: F401
    finally:
        cppext.load = orig
    return types.SimpleNamespace(
        builder=builder, base=base, dusty_v1=dusty_v1, dusty_v2=dusty_v2, vanilla=vanilla
    )
