"""Temperature-scaling calibration for single-label fine-tunes.

The reference has no model inference at all; calibration quality is a
north-star concern of the TPU suggestion loop (BASELINE.json): serving
scores must be usable as probabilities, mirroring the multi-label
``limiar`` calibration (train/job.py) on the softmax side.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.train.finetune import (
    calibrate_temperature,
    expected_calibration_error,
    fold_temperature,
    nll_np,
)


def _synthetic(n=2000, classes=7, scale=1.0, seed=0):
    """Logits whose softmax at ``scale=1`` is the TRUE label distribution;
    returned logits are ``scale`` times that (scale>1 = overconfident)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, classes)) * 2.0
    probs = np.exp(base - base.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    labels = np.array([rng.choice(classes, p=p) for p in probs])
    return base * scale, labels


class TestCalibrateTemperature:
    def test_overconfident_logits_recover_scale(self):
        logits, labels = _synthetic(scale=3.0)
        t, metrics = calibrate_temperature(logits, labels)
        # true temperature is 3.0 (logits were scaled 3x); the NLL optimum
        # over a finite sample lands near it
        assert 2.4 < t < 3.6
        assert metrics["nll"] < metrics["nll_sem_calibracao"]
        assert metrics["ece"] < metrics["ece_sem_calibracao"]

    def test_underconfident_logits(self):
        logits, labels = _synthetic(scale=0.4)
        t, _ = calibrate_temperature(logits, labels)
        assert t < 0.7  # sharpen: divide by T<1

    def test_already_calibrated_stays_near_identity(self):
        logits, labels = _synthetic(scale=1.0)
        t, _ = calibrate_temperature(logits, labels)
        assert 0.8 < t < 1.25

    def test_tiny_split_falls_back_to_identity(self):
        logits, labels = _synthetic(n=4, scale=5.0)
        t, metrics = calibrate_temperature(logits, labels)
        assert t == 1.0
        assert metrics["nll"] == metrics["nll_sem_calibracao"]

    def test_nll_matches_direct_computation(self):
        logits = np.array([[2.0, 0.0], [0.0, 1.0]])
        labels = np.array([0, 1])
        expect = float(
            -np.mean(
                [
                    np.log(np.exp(2.0) / (np.exp(2.0) + 1.0)),
                    np.log(np.exp(1.0) / (np.exp(1.0) + 1.0)),
                ]
            )
        )
        assert nll_np(logits, labels) == pytest.approx(expect, rel=1e-9)

    def test_ece_perfect_predictions_is_low(self):
        # confident-and-right rows: accuracy 1.0 vs confidence ~0.999
        probs = np.tile(np.array([[0.999, 0.001]]), (100, 1))
        labels = np.zeros(100, np.int64)
        assert expected_calibration_error(probs, labels) < 0.01

    def test_ece_overconfident_wrong_is_high(self):
        probs = np.tile(np.array([[0.99, 0.01]]), (100, 1))
        labels = np.ones(100, np.int64)  # always wrong
        assert expected_calibration_error(probs, labels) > 0.9


class TestFoldTemperature:
    def _variables(self, key, d=8, c=5):
        kw, kb = jax.random.split(key)
        return {
            "params": {
                "head": {
                    "w": jax.random.normal(kw, (d, c)),
                    "b": jax.random.normal(kb, (c,)),
                },
                "backbone": {"w": jnp.ones((3, 3))},
            },
            "state": {},
        }

    def test_folded_head_equals_scaled_logits(self):
        key = jax.random.PRNGKey(0)
        variables = self._variables(key)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        t = 2.5
        folded = fold_temperature(variables, t)
        head, fh = variables["params"]["head"], folded["params"]["head"]
        logits = x @ head["w"] + head["b"]
        logits_f = x @ fh["w"] + fh["b"]
        np.testing.assert_allclose(
            np.asarray(logits_f), np.asarray(logits) / t, rtol=1e-5, atol=1e-6
        )
        # softmax(logits/T) == softmax(folded logits) by construction
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(logits / t)),
            np.asarray(jax.nn.softmax(logits_f)),
            rtol=1e-5, atol=1e-6,
        )

    def test_identity_and_none_are_noops(self):
        variables = self._variables(jax.random.PRNGKey(0))
        assert fold_temperature(variables, None) is variables
        assert fold_temperature(variables, 1.0) is variables

    def test_inputs_not_mutated_and_backbone_shared(self):
        variables = self._variables(jax.random.PRNGKey(0))
        w_before = np.asarray(variables["params"]["head"]["w"]).copy()
        folded = fold_temperature(variables, 2.0)
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["head"]["w"]), w_before
        )
        # non-head subtrees are shared, not copied
        assert folded["params"]["backbone"] is variables["params"]["backbone"]
