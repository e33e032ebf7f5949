from .core import IterativeAlgorithm, run_loop, states
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
]
