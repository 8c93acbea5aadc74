"""Gradient / parameter monitoring.

Mirror of reference ``ModelMonitor`` (``src/utils/monitoring.py:8-97``):
per-output-channel gradient norms of the decoder head, post-step update norms,
and all scalar (learned-scale) parameters. Works on grad/param pytrees instead
of hooking torch modules.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _find_decoder(params: Dict) -> Optional[Dict]:
    """Locate the face decoder MLP params (named ``decoder_face``)."""
    def search(tree):
        if not isinstance(tree, dict):
            return None
        for k, v in tree.items():
            if k == "decoder_face":
                return v
            found = search(v)
            if found is not None:
                return found
        return None
    return search(params)


class ModelMonitor:
    """Stateless except for the previous decoder params (for update norms)."""

    def __init__(self):
        self._prev_decoder = None

    def monitor_decoder_gradients(self, grads: Dict, logger, step: int):
        """Per-output-channel gradient norms of the decoder's final layer
        (reference monitoring.py:8-44)."""
        dec = _find_decoder(grads)
        if dec is None or logger is None:
            return
        last = [v for k, v in sorted(dec.items()) if "Dense" in k]
        if not last:
            return
        kernel = last[-1].get("kernel")
        if kernel is None:
            return
        norms = jnp.linalg.norm(kernel, axis=0)      # per output channel
        for i, n in enumerate(np.asarray(norms)):
            logger.save_scalar(float(n), step, f"gradients/face_mlp_out{i}")

    def monitor_decoder_updates(self, params: Dict, logger, step: int):
        """Post-step parameter update norms (reference monitoring.py:46-68)."""
        dec = _find_decoder(params)
        if dec is None:
            return
        if self._prev_decoder is not None and logger is not None:
            diffs = jax.tree.map(lambda a, b: jnp.linalg.norm(a - b),
                                 dec, self._prev_decoder)
            total = sum(float(x) for x in jax.tree.leaves(diffs))
            logger.save_scalar(total, step, "updates/face_mlp")
        self._prev_decoder = jax.tree.map(jnp.copy, dec)

    def monitor_scalar_parameters(self, params: Dict, grads: Optional[Dict],
                                  logger, step: int):
        """All scalar learned parameters (FvgnJ/FluxD scale params) + their
        grads (reference monitoring.py:70-97)."""
        if logger is None:
            return

        def visit(tree, gtree, path):
            if isinstance(tree, dict):
                for k in tree:
                    visit(tree[k], None if gtree is None else gtree.get(k),
                          path + "/" + k)
                return
            if jnp.ndim(tree) == 0 or jnp.size(tree) == 1:
                logger.save_scalar(float(jnp.reshape(tree, ())), step,
                                   f"scalar_params{path}")
                if gtree is not None:
                    logger.save_scalar(float(jnp.reshape(gtree, ())), step,
                                       f"scalar_params{path}_grad")

        visit(params, grads, "")
