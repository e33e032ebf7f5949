from . import tree

__all__ = ["tree"]

# fb_tools is imported lazily by consumers (it depends on prox.base, which in
# turn depends on utils.tree — keeping it out of this __init__ avoids a cycle).
