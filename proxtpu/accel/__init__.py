from .base import NESTEROV, NO_ACCELERATION, QUASI_NEWTON, acceleration_style
from .anderson import AndersonAcceleration
from .broyden import Broyden
from .lbfgs import LBFGS
from .nesterov import (
    AdaptiveNesterovSequence,
    AdaptiveRestartSequence,
    ConstantNesterovSequence,
    FixedNesterovSequence,
    NesterovExtrapolation,
    SimpleNesterovSequence,
)
from .noaccel import NoAcceleration

__all__ = [
    "LBFGS",
    "AndersonAcceleration",
    "Broyden",
    "NoAcceleration",
    "NesterovExtrapolation",
    "FixedNesterovSequence",
    "SimpleNesterovSequence",
    "ConstantNesterovSequence",
    "AdaptiveNesterovSequence",
    "AdaptiveRestartSequence",
    "acceleration_style",
    "QUASI_NEWTON",
    "NESTEROV",
    "NO_ACCELERATION",
]
