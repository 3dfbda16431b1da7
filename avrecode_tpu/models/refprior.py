"""Model families: prior-model configurations of the recompression engine.

The framework currently ships one family, `refprior` — the reference-parity
adaptive prior model (SURVEY.md §2.5) extended with the improvements measured
in this repo (per-slice-class banks, dual-speed estimators, temporal priors,
hypergeometric significance prior, bimodal NZ/EOB selection). The C++
implementation lives in native/model.h; the device implementation in
ops/model_pass.py consumes the exported key streams. This module is the
authoritative description of the family's hyperparameters and key spaces, and
the place where future families (e.g. context-mixing, learned/NN priors) get
registered.

NOTE: these values are *format-defining*: both coders derive them from the
container header/analysis export at runtime; changing them here documents, not
configures, v3 containers.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RefPriorConfig:
    name: str = "refprior"
    # estimator windows (observations before halving)
    fast_window: int = 48
    slow_window: int = 640
    sig_window: int = 0x50        # reference parity: recode.cpp:1042
    # significance mixing
    sig_mix_alpha: int = 1        # weight of the hypergeometric prior
    sig_hash_bits: int = 17       # sig key space is hashed to 2^17 entries
    # batched-update semantics (TPU formulation)
    default_batch: int = 4096
    max_batch: int = 32768        # uint16 counter headroom
    # entropy lanes
    prob_bits: int = 15
    default_lanes: int = 16
    max_lanes: int = 1024


MODEL_FAMILIES = {
    "refprior": RefPriorConfig(),
}
