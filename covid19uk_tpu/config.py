"""Typed, validated configuration.

The reference parses raw YAML dicts with no schema and mutates the config as
a side channel (SURVEY.md §5 'Config').  This module validates the ``Mcmc``
section into a dataclass up front; unknown keys and out-of-range values fail
fast with a pointed message.  The raw-dict interface is still accepted
everywhere for reference parity.
"""

from dataclasses import dataclass, fields
from typing import Optional


@dataclass
class WarmupConfig:
    first_window: int = 200
    slow_window: int = 25
    num_slow_windows: int = 6
    last_window: int = 50


@dataclass
class McmcConfig:
    """The Mcmc config section (reference example_config.yaml:25-34 plus
    framework extensions)."""

    dmax: int = 84
    nmax: int = 25
    m: int = 2
    occult_nmax: int = 15
    num_event_time_updates: int = 5
    move_decay: float = 0.9  # event-move displacement decay; 1.0 = uniform
    x_decay: float = 0.9  # event-count proposal decay; 1.0 = uniform
    # Robbins–Monro autotuning of the move kernels' displacement decays
    # during warmup windows, targeting move_accept_target acceptance
    # (reference manual-tuning practice ~23%, lancs tex:325-326).  Each of
    # move S->E / move E->I gets its own decay, updated between windows
    # from the window's pooled acceptance and frozen for the sampling
    # phase (so sampling is exact fixed-kernel MH).  Decays are traced
    # through the jit boundary — retuning never recompiles.
    autotune_acceptance: bool = True
    move_accept_target: float = 0.23
    # Episode-translation pair moves (S->E and downstream E->I moved
    # together): the measured fix for the slow infectious-person-time
    # mode that throttles gamma0 ESS (gibbs.EventKernelConfig).
    num_pair_updates: int = 1  # pair proposals per sweep, WARMUP windows
    # Pair proposals during sampling bursts: ESS-neutral per draw at
    # equilibrium but ~30% wall at full-UK scale, so off by default
    # (the warmup phase does the equilibrating).
    num_pair_updates_sampling: int = 0
    pair_mmax: int = 1  # locations per pair proposal
    # Pair-proposal displacement decay, decoupled from move_decay: episode
    # translation removes the E-sojourn penalty so long strides survive —
    # uniform (1.0) measured ~1.7x gamma0 ESS and +23% min-scalar ESS/sec
    # over 0.9 at UK scale (3 seeds; gibbs.EventKernelConfig).
    pair_move_decay: float = 1.0
    # Deterministic gamma0 ridge compensation inside each pair proposal
    # (event_kernels.compensated_pair_move_step): removes the I->R penalty
    # on large person-time strides so gamma0 decorrelates faster.
    pair_compensate_gamma0: bool = False
    # Near-iid conditional refresh of (gamma0, gamma1) | events after each
    # event sweep (inference/gamma_gibbs.py): a Laplace independence-MH
    # draw from the exact 2-D conditional.  Measured NEGATIVE on gamma0
    # ESS at UK equilibrium (23.3±1.7 vs 31.7±1.0 off; 3 seeds, warm 4000):
    # the conditional is tight, so the refresh slaves gamma0 to the slow
    # person-time mode while HMC's partial refresh added decorrelating
    # jitter.  Kept as an option for far-from-equilibrium starts, where
    # jumping (gamma0, gamma1) straight to their conditional shortens the
    # initialization transient; off by default.
    gamma_gibbs: bool = False
    # Guided occult location proposal (gibbs.EventKernelConfig
    # occult_guided): sample the occult location from fixed observed-case
    # weights (+ uniform floor) instead of Uniform(M).  Exact — the fixed
    # location factor cancels from the Hastings ratio; stationarity
    # tested.  "auto" guides at M >= 64 (NI-scale uniform already accepts
    # at 0.29-0.38; UK-scale uniform collapses to ~0.000 —
    # tools/diag_occult.py).  "always"/"never" force.
    occult_guided: str = "auto"
    occult_guide_floor: float = 0.1  # uniform mixture weight (ergodicity)
    # Guided MOVE/PAIR location proposal (gibbs.EventKernelConfig
    # move_guided): sample the mmax move locations weighted-without-
    # replacement by the same fixed observed-case weights (full [0, T)
    # window) instead of uniform.  Exact (location factor cancels);
    # "never" until the UK-scale mixing A/B certifies a win.
    move_guided: str = "never"
    move_guide_floor: float = 0.1
    # Joint (gamma0, E->I events) ridge move: measured neutral at NI
    # scale (the binding penalty is the E-sojourn term, not I->R);
    # kept as an option, off by default.
    compensate_gamma0: bool = False
    num_compensated_updates: int = 1  # ridge-move proposals per sweep
    num_bursts: int = 50
    num_burst_samples: int = 100
    thin: int = 1
    # Write warmup-window draws to the posterior store (reference behavior).
    # At MSOA scale the warmup event draws dominate the store (e.g. 4.3 of
    # 5.1 GB at M=7000) and the HDF5 write wall; set False to store the
    # sampling phase only (ThinPosterior.start is then 0).
    store_warmup: bool = True
    num_adaptation_iterations: int = 1000  # accepted for parity; unused
    num_chains: int = 1
    pooled_adaptation: bool = True  # pool step-size/mass across chains
    use_mesh: bool = False  # shard chains over all visible devices
    # With use_mesh: devices along the mesh's `space` axis — the location
    # axis of the event tensor / commuting matmul is sharded over it
    # (MSOA-scale model parallelism, SURVEY.md §2.8).  1 = chains only.
    space_devices: int = 1
    # Convergence gating (SURVEY.md §5 "gated burst loop"): checked between
    # bursts on the scalar parameters; sampling stops early when every
    # enabled criterion is met.  None disables a criterion.
    rhat_stop: Optional[float] = None  # stop when max split R-hat < this
    ess_stop: Optional[int] = None  # stop when min bulk ESS >= this
    # Block-sparse operators for Cstar / the CAR precision: "auto"
    # (size/density gate in ModelData.create), "always", or "never".
    sparse: str = "auto"
    # Let the acceptance autotuner drive the move kernels' EVENT-COUNT
    # (x) decay alongside the displacement decay.  Measured round 5: at
    # NI scale (M=11) the event count is the binding rejection factor —
    # x-tuning reaches the documented 0.23 band and gamma0 ESS rises
    # 154 -> 525 — but at UK scale (M=380, 2 seeds) forcing the band
    # shrinks the moves and COSTS gamma0 ESS (37.2 -> 23.4 mean; the
    # displacement knob alone lands at ~0.18 acceptance, which mixes
    # better there).  "auto" enables x-tuning at M < 64; "always"/
    # "never" force.
    autotune_x: str = "auto"
    # Fused Pallas event sweep (gibbs.EventKernelConfig fused_sweep): run
    # the whole U x 4-kernel multiscan as ONE kernel launch per draw with
    # the chain's planes VMEM-resident.  Same proposals/accept rules as
    # the XLA sweep (distributional equivalence tested); requires a TPU
    # (CPU falls back to the Pallas interpreter — correct but slow).
    # "auto" currently resolves to the XLA path.
    fused_sweep: str = "never"
    dtype: str = "float32"
    seed: int = 1
    # Geometric lag rates for the initialization imputation
    # (I->R -> E->I lag, E->I -> S->E lag).  The default is the reference's
    # (0.25, 0.5) (model_spec.py:108-126) — INCONSISTENT with the model's
    # own sojourn rates; the calibration study (docs/calibration.md)
    # attributes a −13 posterior-sd gamma0 recovery offset entirely to the
    # initial state this derives.  (removal_rate_estimate, 0.28) reduces it.
    impute_rates: tuple = (0.25, 0.5)
    checkpoint: Optional[str] = None
    log_file: Optional[str] = None
    profile_dir: Optional[str] = None
    debug_nans: bool = False  # enable jax_debug_nans (slow; debugging only)
    warmup: Optional[dict] = None

    def __post_init__(self):
        positive = [
            "dmax", "nmax", "m", "occult_nmax", "num_event_time_updates",
            "num_compensated_updates", "pair_mmax",  # num_pair_updates may be 0
            "num_bursts", "num_burst_samples", "thin", "num_chains",
            "space_devices",
        ]
        for name in positive:
            v = getattr(self, name)
            if not isinstance(v, int) or v < 1:
                raise ValueError(f"Mcmc.{name} must be a positive int, got {v!r}")
        for name in ("num_pair_updates", "num_pair_updates_sampling"):
            v = getattr(self, name)
            if not isinstance(v, int) or v < 0:
                raise ValueError(
                    f"Mcmc.{name} must be a non-negative int, got {v!r}"
                )
        for name in ("move_decay", "x_decay", "pair_move_decay"):
            v = getattr(self, name)
            if not (0.0 < v <= 1.0):
                raise ValueError(f"Mcmc.{name} must be in (0, 1], got {v!r}")
        self.impute_rates = tuple(self.impute_rates)
        if len(self.impute_rates) != 2 or any(
            not (isinstance(r, (int, float)) and r > 0.0)
            for r in self.impute_rates
        ):
            raise ValueError(
                "Mcmc.impute_rates must be two positive rates, got "
                f"{self.impute_rates!r}"
            )
        if not (0.0 < self.move_accept_target < 1.0):
            raise ValueError(
                "Mcmc.move_accept_target must be in (0, 1), got "
                f"{self.move_accept_target!r}"
            )
        if self.rhat_stop is not None and not self.rhat_stop > 1.0:
            raise ValueError(
                f"Mcmc.rhat_stop must be > 1.0, got {self.rhat_stop!r}"
            )
        if self.ess_stop is not None and (
            not isinstance(self.ess_stop, int) or self.ess_stop < 1
        ):
            raise ValueError(
                f"Mcmc.ess_stop must be a positive int, got {self.ess_stop!r}"
            )
        if self.sparse not in ("auto", "always", "never"):
            raise ValueError(
                f"Mcmc.sparse must be auto/always/never, got {self.sparse!r}"
            )
        for name in ("occult_guided", "move_guided", "fused_sweep",
                     "autotune_x"):
            if getattr(self, name) not in ("auto", "always", "never"):
                raise ValueError(
                    f"Mcmc.{name} must be auto/always/never, got "
                    f"{getattr(self, name)!r}"
                )
        for name in ("occult_guide_floor", "move_guide_floor"):
            if not (0.0 < getattr(self, name) <= 1.0):
                raise ValueError(
                    f"Mcmc.{name} must be in (0, 1], got "
                    f"{getattr(self, name)!r}"
                )
        if self.dtype not in ("float32", "float64"):
            raise ValueError(
                f"Mcmc.dtype must be float32 or float64, got {self.dtype!r}"
            )
        if self.warmup is not None:
            known = {f.name for f in fields(WarmupConfig)}
            unknown = set(self.warmup) - known
            if unknown:
                raise ValueError(f"Mcmc.warmup unknown keys: {sorted(unknown)}")

    @classmethod
    def from_dict(cls, d):
        known = {f.name for f in fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(
                f"Unknown Mcmc config keys: {sorted(unknown)} "
                f"(known: {sorted(known)})"
            )
        if "num_adaptation_iterations" in d:
            import warnings

            warnings.warn(
                "Mcmc.num_adaptation_iterations is accepted for "
                "reference-config compatibility but has NO effect here: "
                "warmup length is the Stan-style window schedule "
                "(Mcmc.warmup: first_window/slow_window/num_slow_windows/"
                "last_window, default 200 + 25*2^0..2^5 + 50 = 1825 draws). "
                "Set Mcmc.warmup to change warmup length.",
                stacklevel=2,
            )
        return cls(**d)

    def to_dict(self):
        return {f.name: getattr(self, f.name) for f in fields(self)}
