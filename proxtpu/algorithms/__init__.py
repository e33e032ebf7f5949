from .core import IterativeAlgorithm, run_loop, states
from .douglas_rachford import (
    DouglasRachford,
    DouglasRachfordIteration,
    make_douglas_rachford_iteration,
)
from .drls import DRLS, DRLSIteration, make_drls_iteration
from .panoc import PANOC, PANOCIteration, make_panoc_iteration
from .panocplus import PANOCplus, PANOCplusIteration, make_panocplus_iteration
from .zerofpr import ZeroFPR, ZeroFPRIteration, make_zerofpr_iteration
from .fast_forward_backward import (
    FastForwardBackward,
    FastForwardBackwardIteration,
    FastProximalGradient,
    make_fast_forward_backward_iteration,
)
from .forward_backward import (
    ForwardBackward,
    ForwardBackwardIteration,
    ProximalGradient,
    make_forward_backward_iteration,
)

__all__ = [
    "IterativeAlgorithm",
    "run_loop",
    "states",
    "ForwardBackward",
    "ForwardBackwardIteration",
    "ProximalGradient",
    "make_forward_backward_iteration",
    "FastForwardBackward",
    "FastForwardBackwardIteration",
    "FastProximalGradient",
    "make_fast_forward_backward_iteration",
    "PANOC", "PANOCIteration", "make_panoc_iteration",
    "ZeroFPR", "ZeroFPRIteration", "make_zerofpr_iteration",
    "PANOCplus", "PANOCplusIteration", "make_panocplus_iteration",
    "DouglasRachford", "DouglasRachfordIteration",
    "make_douglas_rachford_iteration",
    "DRLS", "DRLSIteration", "make_drls_iteration",
]
