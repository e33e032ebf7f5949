"""Example: sparse linear regression on the diabetes dataset.

Port of the reference's one real-data walkthrough
(``docs/src/examples/sparse_linear_regression.jl:1-80``): fit an
L1-regularized standardized linear model to the classic diabetes data
(442 patients x 10 features; the same table the reference downloads from
www4.stat.ncsu.edu, shipped offline by scikit-learn), with
``FastForwardBackward`` in its default adaptive mode and the smooth term
differentiated automatically through ``AutoDifferentiable`` — the
bring-your-own-objective seam.

    python examples/sparse_linear_regression.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import proxtpu as pa
from proxtpu.prox import NormL1

FEATURE_NAMES = [
    "age", "sex", "bmi", "bp", "s1", "s2", "s3", "s4", "s5", "s6",
]


def load_diabetes_dataset():
    """The raw (unscaled) diabetes table — identical to the reference's
    diabetes.tab.txt source."""
    from sklearn.datasets import load_diabetes

    d = load_diabetes(scaled=False)
    return np.asarray(d.data, np.float64), np.asarray(d.target, np.float64)


def mean_squared_error(label, output):
    return jnp.mean((output - label) ** 2) / 2


def make_training_loss(training_input, training_label):
    """Standardized linear model: weights act on z-scored features, the
    bias absorbs the feature means (``sparse_linear_regression.jl:37-48``)."""
    input_loc = jnp.mean(training_input, axis=0)
    input_scale = jnp.std(training_input, axis=0)

    def standardized_linear_model(wb, inputs):
        w_scaled = wb[:-1] / input_scale
        bias = wb[-1] - jnp.dot(w_scaled, input_loc)
        return inputs @ w_scaled + bias

    loss = pa.AutoDifferentiable(
        lambda wb: mean_squared_error(
            training_label, standardized_linear_model(wb, training_input)
        )
    )
    return loss, standardized_linear_model


def main(verbose=True):
    data, target = load_diabetes_dataset()
    training_input = jnp.asarray(data[:-100])
    training_label = jnp.asarray(target[:-100])
    test_input = jnp.asarray(data[-100:])
    test_label = jnp.asarray(target[-100:])
    n_features = training_input.shape[1]

    training_loss, model = make_training_loss(training_input, training_label)
    reg = NormL1(1.0)

    ffb = pa.FastForwardBackward()
    solution, iterations = ffb(
        x0=jnp.zeros(n_features + 1), f=training_loss, g=reg
    )

    weights = np.asarray(solution[:-1])
    selected = [
        (FEATURE_NAMES[i], float(weights[i]))
        for i in np.flatnonzero(np.abs(weights) > 1e-8)
    ]
    test_mse = float(
        mean_squared_error(test_label, model(solution, test_input))
    )
    if verbose:
        print(f"converged in {iterations} iterations")
        print(f"selected {len(selected)}/{n_features} features:")
        for name, w in selected:
            print(f"  {name:>4s}  {w:+.3f}")
        print(f"test MSE: {test_mse:.2f}")
    return dict(
        iterations=iterations,
        selected=selected,
        weights=weights,
        test_mse=test_mse,
    )


if __name__ == "__main__":
    main()
