"""Regenerate docs/api_reference.md from the package __all__ lists.

    python docs/_gen_api_reference.py
"""

import inspect
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import proxtpu as pa  # noqa: E402
import proxtpu.accel as accel  # noqa: E402
import proxtpu.algorithms as algorithms  # noqa: E402
import proxtpu.kernels as kernels  # noqa: E402
import proxtpu.ops as ops  # noqa: E402
import proxtpu.parallel as parallel  # noqa: E402
import proxtpu.prox  # noqa: E402,F401
import proxtpu.utils as utils  # noqa: E402

# NOTE: ``import proxtpu.prox as prox`` would bind the top-level ``prox``
# FUNCTION (the oracle re-exported by proxtpu/__init__.py shadows the
# submodule attribute), silently dropping the whole prox library from the
# generated reference — resolve the module through sys.modules instead.
prox = sys.modules["proxtpu.prox"]

HEADER = """# API reference

One line per public symbol (the first docstring sentence); see each
docstring for the full contract and the reference file/lines it tracks.
Generated from the package `__all__` lists — regenerate with
`python docs/_gen_api_reference.py`.

"""


def first_sentence(obj):
    doc = inspect.getdoc(obj) or ""
    doc = doc.strip().split("\n\n")[0].replace("\n", " ")
    for stop in (". ",):
        if stop in doc:
            doc = doc.split(stop)[0] + "."
            break
    return doc[:220]


def main():
    out = io.StringIO()
    out.write(HEADER)
    for title, mod in [
        ("proxtpu (top level)", pa),
        ("proxtpu.prox", prox),
        ("proxtpu.algorithms", algorithms),
        ("proxtpu.accel", accel),
        ("proxtpu.parallel", parallel),
        ("proxtpu.ops", ops),
        ("proxtpu.utils", utils),
        ("proxtpu.kernels", kernels),
    ]:
        names = getattr(mod, "__all__", None)
        if not names:
            names = sorted(
                n for n in vars(mod)
                if not n.startswith("_")
                and not inspect.ismodule(vars(mod)[n])
            )
        out.write(f"## {title}\n\n")
        out.write("| Symbol | Summary |\n|---|---|\n")
        for n in names:
            obj = getattr(mod, n, None)
            if obj is None or inspect.ismodule(obj):
                continue
            s = first_sentence(obj).replace("|", "\\|")
            out.write(f"| `{n}` | {s} |\n")
        out.write("\n")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "api_reference.md")
    with open(path, "w") as fh:
        fh.write(out.getvalue())
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
