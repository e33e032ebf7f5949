from . import checkpoint, iteration_tools, profiling, tree
from .precision import get_matmul_precision, pdot, set_matmul_precision

__all__ = ["tree", "iteration_tools", "checkpoint", "profiling", "pdot", "set_matmul_precision", "get_matmul_precision"]

# fb_tools is imported lazily by consumers (it depends on prox.base, which in
# turn depends on utils.tree — keeping it out of this __init__ avoids a cycle).
