"""Golden-value one-step regression tests (SURVEY.md section 4, item 2).

Pins the total log-loss of one deterministic forward+loss step per model
family on a tiny synthetic mesh, guarding the numerics (feature transforms,
normalization, architecture wiring, loss composition) against silent change.
Regenerate the values intentionally when the numerical contract changes:

    python -m pytest tests/test_golden.py --collect-only  # see the recipe
"""

import jax
import numpy as np
import pytest

from test_models import build_graph, make_model

GOLDEN = {
    "FvgnA": 3.236853,
    "MgnA": 2.639708,
    "FluxD": 3.467385,
    "ConservativeA": 4.890163,
    "VertPotA": 3.458843,
    "StreamFuncA": 2.499293,
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_one_step_loss_golden(name):
    g = build_graph(grad_weights=True)
    m = make_model(name, g)
    tg, feats = m.transform_features(g, None, mode="train")
    v = m.init(jax.random.PRNGKey(7), tg, feats)
    out, _ = m.forward(v, tg, feats, mode="train")
    losses = m.loss(out, feats, tg)
    np.testing.assert_allclose(float(losses["total_log_loss"]),
                               GOLDEN[name], rtol=1e-4)
