from .base import (
    AutoDifferentiable,
    IndZero,
    Zero,
    convex_conjugate,
    is_convex,
    is_generalized_quadratic,
    prox,
    proxclass,
    value_and_gradient,
)
from .combinators import (
    Conjugate,
    MoreauEnvelope,
    Postcompose,
    SeparableSum,
    SlicedSeparableSum,
)
from .functions import (
    ElasticNet,
    IndAffine,
    IndBox,
    IndNonnegative,
    IndPoint,
    LeastSquares,
    LeastSquaresLoss,
    Linear,
    LogisticLoss,
    NormL1,
    NormL21,
    NuclearNorm,
    NormL2,
    Quadratic,
    SqrDistance,
    SqrNormL2,
    Translate,
    make_ind_affine,
    make_least_squares,
)

__all__ = [
    "Zero", "IndZero", "AutoDifferentiable", "convex_conjugate", "prox",
    "value_and_gradient", "proxclass", "is_convex", "is_generalized_quadratic",
    "NormL1", "NormL2", "NormL21", "NuclearNorm", "SqrNormL2", "ElasticNet", "Linear", "IndBox",
    "IndNonnegative", "IndPoint", "IndAffine", "LeastSquares", "LeastSquaresLoss", "Translate",
    "Quadratic", "LogisticLoss", "SqrDistance", "make_least_squares",
    "make_ind_affine", "Conjugate", "SeparableSum", "SlicedSeparableSum",
    "Postcompose", "MoreauEnvelope",
]
