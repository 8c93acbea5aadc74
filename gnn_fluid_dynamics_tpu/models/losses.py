"""Loss functions (masked for padding, per-graph pooled variants).

Counterparts of reference ``src/utils/loss.py`` with explicit validity masks:
the reference's batches have no padded elements, so a masked mean over valid
elements reproduces its unmasked ``torch.nn.MSELoss(reduction='mean')``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_per_element(output: jax.Array, target: jax.Array,
                    mask: jax.Array) -> jax.Array:
    """Mean squared error over valid elements (reference
    ``MSE_per_element_torch``, loss.py:55-60). ``mask``: (N,) bool — selects
    rows; all feature columns of a selected row count toward the mean."""
    se = (output - target) ** 2
    # where-select (not multiply) so inf/nan in padded rows cannot leak
    se = jnp.where(mask[:, None], se, 0.0)
    n = jnp.sum(mask.astype(se.dtype)) * se.shape[-1]
    return jnp.sum(se) / jnp.maximum(n, 1.0)


def mse_per_batch(output: jax.Array, target: jax.Array,
                  mask: jax.Array) -> jax.Array:
    """Summed squared error (reference ``MSE_per_batch_torch``, loss.py:62-67)."""
    se = jnp.where(mask[:, None], (output - target) ** 2, 0.0)
    return jnp.sum(se)


def mse_per_graph(output: jax.Array, target: jax.Array, mask: jax.Array,
                  batch: jax.Array, num_graphs: int) -> jax.Array:
    """Per-graph mean of row-mean squared errors (reference ``MSE_per_graph``,
    loss.py:36-52). Returns (num_graphs,)."""
    node_mse = jnp.mean((output - target) ** 2, axis=-1)
    m = mask.astype(node_mse.dtype)
    node_mse = jnp.where(mask, node_mse, 0.0)
    s = jax.ops.segment_sum(node_mse, batch, num_segments=num_graphs)
    n = jax.ops.segment_sum(m, batch, num_segments=num_graphs)
    return s / jnp.maximum(n, 1.0)


def rel_mse_per_graph(prediction: jax.Array, target: jax.Array,
                      mask: jax.Array, batch: jax.Array,
                      num_graphs: int) -> jax.Array:
    """Per-graph relative MSE: sum|pred-gt|^2 / sum|gt|^2 pooled per graph —
    the rollout error metric (reference ``RelMSE_per_graph``, loss.py:70-89).
    Returns (num_graphs,)."""
    diff = prediction - target
    if diff.ndim > 1 and diff.shape[-1] > 1:
        diff_sq = jnp.sum(diff ** 2, axis=-1)
        target_sq = jnp.sum(target ** 2, axis=-1)
    else:
        diff_sq = diff.reshape(diff.shape[0], -1)[:, 0] ** 2
        target_sq = target.reshape(target.shape[0], -1)[:, 0] ** 2
    diff_sq = jnp.where(mask, diff_sq, 0.0)
    target_sq = jnp.where(mask, target_sq, 0.0)
    ssum_diff = jax.ops.segment_sum(diff_sq, batch, num_segments=num_graphs)
    ssum_gt = jax.ops.segment_sum(target_sq, batch, num_segments=num_graphs)
    return ssum_diff / jnp.maximum(ssum_gt, 1e-12)


def combined_log_loss(components: dict, weights: dict) -> jax.Array:
    """total = mean(log(sum_i w_i * L_i)) — the reference's combined loss form
    (e.g. ``Fvgn.py:202-204``). ``components`` values are scalars here (the
    per-element loss), so the mean is over a scalar; kept for shape parity."""
    total = None
    for name, value in components.items():
        w = weights.get(name, None)
        if w is None:
            continue
        term = w * value
        total = term if total is None else total + term
    return jnp.mean(jnp.log(total))
