"""Declarative, functional normalization.

The reference implements normalization as a lambda registry mutating PyG graphs
in place (``src/utils/normalisation.py:207-278``). In a functional JAX setting
in-place accessor lambdas don't work, so the same contract is expressed as
*declarative field specs*: each spec names a statistics key, a tensor in the
feature bundle, a column slice, and a scheme. Stats live in a plain dict of
scalars (a pytree), normalization is a pure function bundle -> bundle.

Schemes match reference ``normalisation.py:281-322`` exactly:
``z_score``, ``mean_scale``, ``std_scale``, ``min_max``, ``max_scale``.

Statistics accumulation matches the reference's batch Welford + min/max
(``normalisation.py:80-181``), with the addition of padding masks (the
reference never had padded elements).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-8
MIN_STD = 1e-8


# --------------------------------------------------------------------------
# Schemes (reference normalisation.py:281-322)
# --------------------------------------------------------------------------

def z_score(data, stats, inverse=False):
    std = jnp.maximum(stats["std"], MIN_STD)
    if not inverse:
        return (data - stats["mean"]) / (std + EPS)
    return data * (std + EPS) + stats["mean"]


def mean_scale(data, stats, inverse=False):
    if not inverse:
        return data / (stats["mean"] + EPS)
    return data * (stats["mean"] + EPS)


def std_scale(data, stats, inverse=False):
    if not inverse:
        return data / (stats["std"] + EPS)
    return data * (stats["std"] + EPS)


def min_max(data, stats, inverse=False):
    rng = stats["max"] - stats["min"]
    if not inverse:
        return (data - stats["min"]) / (rng + EPS)
    return data * (rng + EPS) + stats["min"]


def max_scale(data, stats, inverse=False):
    if not inverse:
        return data / (stats["max"] + EPS)
    return data * (stats["max"] + EPS)


SCHEMES: Dict[str, Callable] = {
    "z_score": z_score,
    "mean_scale": mean_scale,
    "std_scale": std_scale,
    "min_max": min_max,
    "max_scale": max_scale,
}


# --------------------------------------------------------------------------
# Field specs
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Field:
    """One normalized field: columns [start, stop) of bundle[tensor], using the
    statistics under ``stat_key`` with the registry's scheme for that key."""
    name: str
    tensor: str          # key into the feature/output bundle, e.g. "cell_x"
    start: int
    stop: int
    stat_key: str


@dataclasses.dataclass(frozen=True)
class StatSpec:
    """How to gather statistics for one stat key. ``extractor``: (tensor,
    start, stop) slice, or ("norm", tensor, start, stop) for the row-wise
    L2 norm of a slice (MgnC's ``cell_velocity_char``), or None for derived
    stats (FvgnE's ``characteristic_pressure``)."""
    scheme: str
    extractor: Optional[Tuple] = None


@dataclasses.dataclass(frozen=True)
class NormalizationMap:
    """registry: stat_key -> StatSpec; inputs/outputs: ordered Field lists.
    Mirrors reference ``Model.get_normalisation_map`` returns."""
    registry: Dict[str, StatSpec]
    inputs: Tuple[Field, ...]
    outputs: Tuple[Field, ...]

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _apply_fields(bundle: Dict[str, jax.Array], fields, registry, stats,
                  inverse: bool) -> Dict[str, jax.Array]:
    # rebuild each tensor by concatenating transformed/untouched channel
    # segments: in-place slice updates lowered to a serial dynamic-update-
    # slice on TPU (~ms per train step on transposed-layout activations)
    out = dict(bundle)
    by_tensor: Dict[str, list] = {}
    for f in fields:
        if f.tensor not in out or out[f.tensor] is None:
            continue
        by_tensor.setdefault(f.tensor, []).append(f)
    for tensor, fs in by_tensor.items():
        x = out[tensor]
        fs_sorted = sorted(fs, key=lambda f: f.start)
        if any(a.stop > b.start for a, b in zip(fs_sorted, fs_sorted[1:])):
            # overlapping segments: apply sequentially (rare; matches the
            # reference's in-place semantics)
            for f in fs_sorted:
                scheme = SCHEMES[registry[f.stat_key].scheme]
                seg = scheme(x[..., f.start:f.stop], stats[f.stat_key],
                             inverse)
                x = x.at[..., f.start:f.stop].set(seg)
            out[tensor] = x
            continue
        parts = []
        pos = 0
        for f in fs_sorted:
            if f.start > pos:
                parts.append(x[..., pos:f.start])
            scheme = SCHEMES[registry[f.stat_key].scheme]
            parts.append(scheme(x[..., f.start:f.stop], stats[f.stat_key],
                                inverse))
            pos = f.stop
        if pos < x.shape[-1]:
            parts.append(x[..., pos:])
        out[tensor] = parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=-1)
    return out


def normalize_inputs(bundle, nmap: NormalizationMap, stats, inverse=False):
    """Reference ``CustomNormalizer.input`` (normalisation.py:255-264)."""
    return _apply_fields(bundle, nmap.inputs, nmap.registry, stats, inverse)


def normalize_outputs(bundle, nmap: NormalizationMap, stats, inverse=False):
    """Reference ``CustomNormalizer.output`` (normalisation.py:266-278)."""
    return _apply_fields(bundle, nmap.outputs, nmap.registry, stats, inverse)


# --------------------------------------------------------------------------
# Statistics accumulation (batch Welford, masked)
# --------------------------------------------------------------------------

class StatsAccumulator:
    """Streaming masked Welford + min/max per stat key
    (reference ``CustomAccumulator``, normalisation.py:10-205)."""

    def __init__(self, nmap: NormalizationMap):
        self.nmap = nmap
        self.state: Dict[str, Dict[str, float]] = {}

    @staticmethod
    def _extract(bundle, masks, spec: StatSpec):
        ex = spec.extractor
        if ex is None:
            return None, None
        if ex[0] == "norm":
            # row-wise L2 norm of a slice (MgnC cell_velocity_char)
            _, tensor, start, stop = ex
            x = bundle[tensor]
            data = jnp.linalg.norm(x[..., start:stop], axis=-1)
            tensor_key = tensor
        elif ex[0] == "sqrt":
            # sqrt of a field (FvgnE characteristic_length = sqrt(volume))
            _, tensor, start, stop = ex
            data = jnp.sqrt(bundle[tensor][..., start:stop])
            tensor_key = tensor
        elif ex[0] == "slice0":
            # first bundled timestep only (FvgnC stats, Fvgn.py:521-523)
            _, tensor, start, stop = ex
            data = bundle[tensor][:, 0, start:stop]
            tensor_key = tensor
        else:
            tensor, start, stop = ex
            x = bundle[tensor]
            data = x[..., start:stop]
            tensor_key = tensor
        mask = masks.get(tensor_key)
        return data, mask

    def update(self, bundle: Dict[str, jax.Array],
               masks: Dict[str, jax.Array]):
        """``masks`` maps tensor key -> (N,) bool validity mask."""
        for key, spec in self.nmap.registry.items():
            data, mask = self._extract(bundle, masks, spec)
            if data is None:
                continue
            data = np.asarray(data, np.float64)
            if mask is not None:
                m = np.asarray(mask, bool)
                data = data[m] if data.ndim == 1 else data[m, ...]
            flat = data.reshape(-1)
            if flat.size == 0:
                continue
            st = self.state.setdefault(key, {
                "mean": 0.0, "M2": 0.0, "count": 0,
                "min": float("inf"), "max": float("-inf")})
            st["min"] = min(st["min"], float(flat.min()))
            st["max"] = max(st["max"], float(flat.max()))
            n_b = flat.size
            mean_b = float(flat.mean())
            m2_b = float(((flat - mean_b) ** 2).sum())
            n_old = st["count"]
            n_new = n_old + n_b
            delta = mean_b - st["mean"]
            st["mean"] += delta * n_b / n_new
            st["M2"] += m2_b + delta ** 2 * n_old * n_b / n_new
            st["count"] = n_new

    def finalize(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for key, st in self.state.items():
            if st["count"] > 1:
                var = st["M2"] / (st["count"] - 1)
                std = float(np.sqrt(max(var, 1e-16)))
            else:
                std = 1e-4
            out[key] = {"mean": st["mean"], "std": std,
                        "min": st["min"], "max": st["max"]}
        # derived stats (reference normalisation.py:183-197)
        needs_char_p = any(f.stat_key == "characteristic_pressure"
                           for f in self.nmap.inputs + self.nmap.outputs)
        if needs_char_p and "characteristic_velocity" in out:
            v_max = out["characteristic_velocity"]["max"]
            p_max = 0.5 * v_max ** 2
            out["characteristic_pressure"] = {
                "mean": p_max / 2, "std": p_max / 4, "min": 0.0, "max": p_max}
        return out


def stats_to_arrays(stats: Dict[str, Dict[str, float]], dtype=jnp.float32):
    """Plain-dict stats -> pytree of jnp scalars (checkpointable)."""
    return {k: {s: jnp.asarray(v, dtype) for s, v in d.items()}
            for k, d in stats.items()}


def save_stats(stats, path: str):
    def tofloat(d):
        return {k: (tofloat(v) if isinstance(v, dict) else float(v))
                for k, v in d.items()}
    with open(path, "w") as f:
        json.dump(tofloat(stats), f, indent=2)


def load_stats(path: str):
    with open(path) as f:
        return json.load(f)
