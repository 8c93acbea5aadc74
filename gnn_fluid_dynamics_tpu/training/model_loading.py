"""Model-state loading shims (reference ``src/utils/model_loading.py``).

* :func:`load_params_flexible` — shape-tolerant parameter restore
  (reference ``load_model_state_dict_flexible``, model_loading.py:103-148):
  leaves whose shapes match are copied, mismatches keep the freshly
  initialized value and are reported;
* :func:`backward_compatibility` — legacy parameter-name remapping
  (reference model_loading.py:90-100);
* :func:`update_config` / config merging lives in
  :mod:`gnn_fluid_dynamics_tpu.training.config`.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# legacy name -> current name remaps (extend as checkpoint formats evolve)
LEGACY_RENAMES: Dict[str, str] = {
    "decoder": "decoder_face",
}


def backward_compatibility(params: Dict) -> Dict:
    """Rename legacy parameter-tree keys in place of the reference's
    state-dict key rewriting."""
    def visit(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            out[LEGACY_RENAMES.get(k, k)] = visit(v)
        return out
    return visit(params)


def load_params_flexible(target: Dict, restored: Dict
                         ) -> Tuple[Dict, List[str]]:
    """Copy every restored leaf whose path exists in ``target`` with a
    matching shape; keep the target's (fresh) value otherwise.

    Returns (merged_params, skipped_paths).
    """
    restored = backward_compatibility(restored)
    skipped: List[str] = []

    def visit(tgt, src, path=""):
        if not isinstance(tgt, dict):
            if src is None:
                skipped.append(f"{path} (missing in checkpoint)")
                return tgt
            src_arr = jnp.asarray(src)
            if src_arr.shape != jnp.shape(tgt):
                skipped.append(f"{path} (shape {src_arr.shape} != "
                               f"{jnp.shape(tgt)})")
                return tgt
            return src_arr.astype(jnp.asarray(tgt).dtype)
        out = {}
        src = src if isinstance(src, dict) else {}
        for k, v in tgt.items():
            out[k] = visit(v, src.get(k), f"{path}/{k}")
        extra = set(src) - set(tgt)
        for k in sorted(extra):
            skipped.append(f"{path}/{k} (unexpected in checkpoint)")
        return out

    merged = visit(target, restored)
    if skipped:
        print("load_params_flexible skipped:")
        for s in skipped[:20]:
            print("   ", s)
        if len(skipped) > 20:
            print(f"    ... and {len(skipped) - 20} more")
    return merged, skipped
