"""Static model specification and padded data layout.

The reference keeps data as a dict of ragged, concatenated-per-view arrays and
drives the model with host-side index lists (``create_view_idx_dict``,
/root/reference/gpsa/models/gpsa.py:155-183). Under XLA everything must be
static-shaped, so the TPU-native layout is *stacked and masked*:

  per modality:  coords  (n_views, N_pad, D)
                 outputs (n_views, N_pad, P)
                 mask    (n_views, N_pad)        1.0 = real point, 0.0 = pad

``ModelSpec`` carries every shape/flag that must be known at trace time and is
hashable so jitted functions can close over it as a static argument.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


@dataclass(frozen=True)
class ModalitySpec:
    """Static shape info for one modality (e.g. "expression", "histology")."""

    name: str
    n_padded: int  # per-view padded point count
    n_outputs: int  # P
    n_latent: int  # L: n_latent_gps if LMC enabled, else P
    use_lmc: bool
    n_samples: Tuple[int, ...]  # true per-view counts (host bookkeeping)

    @property
    def n_total(self) -> int:
        return int(sum(self.n_samples))


@dataclass(frozen=True)
class ModelSpec:
    """Everything the traced functions need to know statically.

    Mirrors the constructor surface of the reference ``VariationalGPSA``
    (/root/reference/gpsa/models/vgpsa.py:15-59) minus the learned state.
    """

    modalities: Tuple[ModalitySpec, ...]
    n_views: int
    n_spatial_dims: int
    m_X_per_view: int
    m_G: int
    kernel_warp: str = "rbf"
    kernel_data: str = "rbf"
    mean_function: str = "identity_fixed"
    n_noise_variance_params: int = 2
    fixed_view_mask: Tuple[bool, ...] = ()
    # Which hyperparameters are frozen (moved to the non-trainable pytree):
    fixed_warp_kernel_variances: bool = False
    fixed_warp_kernel_lengthscales: bool = False
    fixed_data_kernel_lengthscales: bool = False
    diagonal_offset: float = 1e-5
    # Reference-parity switch: vgpsa.py:334-340 passes the marginal *variance*
    # as the Normal scale when sampling warp coordinates. Default False =
    # mathematically-correct sqrt(variance); True replicates the reference.
    reference_sample_scale: bool = False
    mean_penalty_param: float = 0.0
    # Chunk the data-layer point axis through lax.map blocks of at most this
    # many points (None = unchunked). Bounds the O(S*L*N*m_G) variance
    # intermediate for very large N; samples are bit-identical either way.
    data_chunk_size: Optional[int] = None
    # Compute the data-layer expected log-likelihood in closed form
    # (Rao-Blackwellized SVGP; only the warp layer is sampled). False =
    # reference parity (the reference samples F, vgpsa.py:423-426).
    analytic_data_likelihood: bool = False
    # Matmul precision for the SVGP projection products (O(m^2 N)): "highest"
    # = f32; "high" = bf16 3-pass, faster at large N. Gram construction and
    # Cholesky always stay at highest precision. build_spec's "auto" default
    # resolves to "high" at >= 2000 total points, "highest" below (the spec
    # always stores the resolved value).
    svgp_matmul_precision: str = "highest"
    # MXU precision for the SVGP *variance-term* products only — the
    # O(S L N m^2) diag quadratic forms (alpha^T Omega factors, squared and
    # row-summed) plus the solve path's alpha^T L. These dominate the
    # real-data step's FLOPs (the two projection fusions are ~27% of m=200
    # device time, op_profile_visium.json) but only feed sigma through sums
    # of squares, while the predictive MEAN keeps svgp_matmul_precision.
    # "follow" = inherit svgp_matmul_precision (bit-identical to the
    # pre-knob behavior); "default" = 1-pass bf16, ~3x fewer MXU passes
    # than "high" on those products. build_spec's "auto" default resolves
    # to "default" exactly where svgp_matmul_precision resolves to "high"
    # (>= 2000 total points): measured +13-16% steps/s at m=200/N=4050
    # with convergence-level accuracy parity over 8 restarts x 2 seeds
    # (median aligned error RATIO 0.83-0.86 in bf16's favor; TPU fwd/vjp
    # numerics 3e-7 rel — the squared-sum structure cancels the rounding).
    # A/B: experiments/out/variance_precision_ab.json,
    # quad_pallas_step_ab.json arms xla+{follow,default}.
    svgp_variance_precision: str = "follow"
    # How Kuu^-1 is applied (SVGP predictive + the KL's prior solve):
    # "solve" = per-use triangular solves (backward-stable;
    # reference-equivalent); "kl_inverse" = predictive keeps solves, the KL
    # reuses an explicit chol(Kuu)^-1 (one merged width-m solve per step) so
    # its prior solve becomes an MXU matmul; "inverse" = the predictive uses
    # the explicit inverse too; "mixed" = the predictive mean is reassociated
    # through a narrow (width-C) backward-stable solve while only the
    # variance quadratic forms use the inverse — no width-N solve at all,
    # mean-exact like "solve". TPU triangular solves are serial block loops
    # (InvertDiagBlocksLowerTriangular) paid per DISPATCH, so consolidating
    # them is the win (experiments/out/op_profile_visium.json). "inverse" is
    # fastest but measured median 14.6x worse converged alignment at m=200 —
    # the late-training Gram sits at the f32 conditioning floor and the
    # predictive mean is hypersensitive there
    # (experiments/out/solve_mode_convergence_ab.json); build_spec's "auto"
    # therefore resolves to the accuracy-neutral "kl_inverse" (cleared at
    # both m=200 and the small-m oracle config, solve_mode_smallm_ab.json).
    # The dataclass default stays "solve" for old-checkpoint compatibility.
    svgp_solve_mode: str = "solve"
    # Variational covariance parameterization. False (default, reference
    # parity): Omega = Omega_sqt @ Omega_sqt^T + eps*I with a free square
    # factor (vgpsa.py:206-210), costing one m^3 Cholesky per factor per
    # step. True: Omega_sqt is read as a lower-triangular Cholesky factor
    # directly (tril; GPflow-style q_sqrt) — same covariance family, no
    # per-step factorization. The KL's -log|det| barrier keeps the diagonal
    # away from zero, so no jitter is needed on the factor.
    triangular_variational: bool = False
    # Whitened variational parameterization (GPflow's `whiten=True`): the
    # stored variational state is w = L^-1 (u - mu_z) with q(w) =
    # N(delta, tril(Omega_sqt) tril(Omega_sqt)^T), i.e. q(u) =
    # N(mu_z + L delta, L A A^T L^T) for L = chol(Kuu). Three effects:
    # (1) the KL needs no Kuu solve or prior log-det (kl_whitened);
    # (2) the predictive needs ONE triangular solve (L^-1 Kuf) instead of
    #     cholesky_solve's two;
    # (3) q is expressed relative to the CURRENT prior, so when the learned
    #     inducing points / kernel hyperparameters move, the posterior moves
    #     with them instead of chasing them — the standard fix for
    #     SVGP optimization pathologies. Implies the factor is read as a
    #     lower-triangular Cholesky (like triangular_variational).
    whitened_variational: bool = False
    # Merge every same-sized per-step factorization / KL solve into single
    # batched dispatches (compute_factors / kl_divergence) — the m=200 step
    # is latency-bound on dispatch count, not FLOPs. parallel.distribute()
    # clears this when the model axis shards the variational state: a single
    # batched op whose lanes carry different shardings (replicated Grams +
    # model-sharded Omega_sqt_F) makes the SPMD partitioner emit NaN into
    # the zero-weight lanes' gradients (observed on the (4,2) virtual mesh),
    # and would force per-step reshard collectives anyway. Unmerged lanes
    # are bit-identical, just more dispatches.
    merged_factor_dispatch: bool = True
    # Which Cholesky implementation this model's factorization sites use:
    # "auto" (default) = the fused batched Pallas kernel on the TPU backend
    # when the slab clears the m/batch gates (ops/linalg._chol), XLA
    # elsewhere; "xla"/"pallas" force one. Per-model and trace-time static —
    # parallel.distribute() replaces it on ITS model when sharding requires
    # (never a process-global flip, so other models in the same process keep
    # their own choice). The deprecated ``linalg.set_cholesky_impl`` global
    # still overrides models left at "auto".
    cholesky_impl: str = "auto"
    # Which implementation the SVGP variance quadratic forms use: "xla"
    # (what "auto" resolves to today) = the inline jnp form, XLA autodiff;
    # "pallas" = the fused quad-diag kernel + recompute VJP
    # (ops/pallas_quad.py) on the TPU backend where the materialized
    # (..., L, N, m) product tensor is large. The kernel is correct and
    # HBM-minimal but MEASURED SLOWER than XLA's fused lowering at the
    # m=200/N=4050 real-data step (371 vs 397 steps/s at 1-pass variance
    # precision, 282 vs 342 at 3-pass — quad_pallas_step_ab.json), so it
    # stays opt-in. parallel.distribute() additionally pins sharded models
    # to "xla" on ITS spec (the point axis is the sharded axis and the
    # kernel has no custom_partitioning rule).
    quad_diag_impl: str = "xla"
    # Fuse the factor pass's final Cholesky dispatch and the explicit
    # chol(Kuu)^-1 inverses (consumed by the inverse/kl_inverse/mixed solve
    # modes) into ONE Pallas kernel (ops/pallas_factor.py): the factor slab
    # never round-trips to HBM between the factorization and the
    # substitution, and the InvertDiagBlocks custom call + its layout
    # copies disappear. "auto" resolves to OFF: the step-level A/B
    # (experiments/out/pallas_factor_step_ab.json) measured the fused
    # kernel at 0.970x at the m=200 Visium config and noise at the
    # north-star — mechanism in ops/pallas_factor.py. "fused"/"off" force.
    fused_factor_inverse: str = "auto"

    # ---- derived helpers -------------------------------------------------
    @property
    def modality_names(self) -> Tuple[str, ...]:
        return tuple(m.name for m in self.modalities)

    @property
    def n_modalities(self) -> int:
        return len(self.modalities)

    def modality(self, name: str) -> ModalitySpec:
        for m in self.modalities:
            if m.name == name:
                return m
        raise KeyError(name)

    @property
    def any_fixed_view(self) -> bool:
        return any(self.fixed_view_mask)

    def replace(self, **kw) -> "ModelSpec":
        return dataclasses.replace(self, **kw)


def spec_to_dict(spec: ModelSpec) -> dict:
    """JSON-serializable dict of a ModelSpec (for self-contained checkpoints).

    Everything in the spec is ints/strs/bools/floats/tuples, so
    ``dataclasses.asdict`` plus tuple->list is a faithful round trip with
    ``spec_from_dict``.
    """
    return dataclasses.asdict(spec)


def spec_from_dict(d: dict) -> ModelSpec:
    """Inverse of ``spec_to_dict`` (lists from JSON become tuples again)."""
    mods = tuple(
        ModalitySpec(
            name=m["name"],
            n_padded=int(m["n_padded"]),
            n_outputs=int(m["n_outputs"]),
            n_latent=int(m["n_latent"]),
            use_lmc=bool(m["use_lmc"]),
            n_samples=tuple(int(c) for c in m["n_samples"]),
        )
        for m in d["modalities"]
    )
    rest = {k: v for k, v in d.items() if k not in ("modalities", "fixed_view_mask")}
    return ModelSpec(
        modalities=mods,
        fixed_view_mask=tuple(bool(b) for b in d["fixed_view_mask"]),
        **rest,
    )


def _as_numpy(x) -> np.ndarray:
    """Accept numpy / jax / torch-cpu arrays."""
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def build_spec(
    data_dict: Dict[str, dict],
    *,
    m_X_per_view: int,
    m_G: int,
    n_latent_gps: Optional[Dict[str, Optional[int]]] = None,
    kernel_warp: str = "rbf",
    kernel_data: str = "rbf",
    mean_function: str = "identity_fixed",
    n_noise_variance_params: int = 2,
    fixed_view_idx=None,
    fixed_warp_kernel_variances=None,
    fixed_warp_kernel_lengthscales=None,
    fixed_data_kernel_lengthscales=None,
    diagonal_offset: float = 1e-5,
    reference_sample_scale: bool = False,
    mean_penalty_param: float = 0.0,
    pad_multiple: int = 1,
    data_chunk_size=None,
    analytic_data_likelihood: bool = False,
    svgp_matmul_precision: str = "auto",
    svgp_variance_precision: str = "auto",
    svgp_solve_mode: str = "auto",
    triangular_variational: bool = False,
    whitened_variational: bool = False,
    cholesky_impl: str = "auto",
    quad_diag_impl: str = "auto",
    fused_factor_inverse: str = "auto",
) -> ModelSpec:
    """Derive a ModelSpec from a reference-format data_dict.

    Validation parity: all modalities must share n_views and n_spatial_dims
    (/root/reference/gpsa/models/gpsa.py:45-68). ``n_spatial_dims`` is derived
    from the data (the reference's constructor arg is swallowed; SURVEY.md
    §2.4.5 — we reproduce the effective, shape-driven behavior).

    ``pad_multiple`` rounds each modality's padded per-view size up to a
    multiple (used to make the point axis shardable over a device mesh).
    """
    names = list(data_dict.keys())
    n_views_set = {len(data_dict[m]["n_samples_list"]) for m in names}
    if len(n_views_set) != 1:
        raise ValueError("Each modality must have the same number of views.")
    n_views = n_views_set.pop()

    dims = {_as_numpy(data_dict[m]["spatial_coords"]).shape[1] for m in names}
    if len(dims) != 1:
        raise ValueError("Each modality must have the same number of spatial dimensions.")
    n_spatial_dims = dims.pop()

    if n_latent_gps is None:
        n_latent_gps = {m: None for m in names}

    modalities = []
    for name in names:
        entry = data_dict[name]
        counts = tuple(int(c) for c in entry["n_samples_list"])
        P = int(_as_numpy(entry["outputs"]).shape[1])
        L_cfg = n_latent_gps.get(name)
        use_lmc = L_cfg is not None
        L = int(L_cfg) if use_lmc else P
        n_pad = max(max(counts), 1)
        if pad_multiple > 1:
            n_pad = int(-(-n_pad // pad_multiple) * pad_multiple)
        modalities.append(
            ModalitySpec(
                name=name,
                n_padded=n_pad,
                n_outputs=P,
                n_latent=L,
                use_lmc=use_lmc,
                n_samples=counts,
            )
        )

    if svgp_matmul_precision == "auto":
        # bf16 3-pass MXU projections ("high") are 1.2x at the m=200 /
        # N=4k real-data scale with convergence-level accuracy parity
        # (experiments/out/{step_profile,precision_convergence_ab}.json);
        # at small N the O(m^2 N) products are latency-bound and "highest"
        # (f32) costs nothing, so keep exact f32 there.
        total_points = sum(sum(m.n_samples) for m in modalities)
        svgp_matmul_precision = "high" if total_points >= 2000 else "highest"

    if svgp_variance_precision == "auto":
        # Resolve WITH the matmul gate: wherever the projections run bf16
        # 3-pass ("high"), the variance-only products drop to 1-pass bf16 —
        # +13-16% steps/s at m=200/N=4050 with convergence-parity medians
        # over 8 restarts x 2 seeds (variance_precision_ab.json; the sigma
        # terms are sums of squares, so the 1-pass rounding cancels to
        # ~3e-7 rel on TPU). Where matmul stays exact f32 ("highest" —
        # small latency-bound configs), "follow" keeps variance exact too.
        svgp_variance_precision = (
            "default" if svgp_matmul_precision == "high" else "follow"
        )
    if svgp_variance_precision not in ("follow", "default", "high", "highest"):
        raise ValueError(
            "svgp_variance_precision must be 'auto', 'follow', 'default', "
            f"'high' or 'highest', got {svgp_variance_precision!r}"
        )

    if svgp_solve_mode == "auto":
        # Both resolutions share the factor pass's explicit chol(Kuu)^-1 for
        # the KL's prior solve (accuracy-neutral at convergence in BOTH
        # sensitive regimes: median error ratio 1.04 at m=200/N=4050 over
        # 10k epochs, solve_mode_convergence_ab.json, and 0.93 at the
        # small-m de-novo oracle config, solve_mode_smallm_ab.json). At
        # scale, "mixed" additionally replaces the predictive's width-N
        # block-loop solve with MXU matmuls against the inverse (mean stays
        # backward-stable through a narrow width-C solve; accuracy gates:
        # mixed median error ratio 0.83 at the small-m oracle config and
        # 1.17 at ~2e-5 absolute at m=200): measured +7-14% steps/s at
        # every config except the smallest (m=50, 200 points, where the
        # extra dispatches make it 0.91x — solve_prng_step_ab.json, plus
        # the m in {50,100,128} x N in {200,4050} crossover probes). Gate:
        # mixed at m >= 64 or >= 2000 total points, kl_inverse below. Full
        # "inverse" stays opt-in: measured median 14.6x converged-alignment
        # cost at m=200.
        total_points = sum(sum(m.n_samples) for m in modalities)
        if max(m_X_per_view, m_G) >= 64 or total_points >= 2000:
            svgp_solve_mode = "mixed"
        else:
            svgp_solve_mode = "kl_inverse"
    if svgp_solve_mode not in ("solve", "kl_inverse", "inverse", "mixed"):
        raise ValueError(
            f"svgp_solve_mode must be 'solve', 'kl_inverse', 'inverse', "
            f"'mixed' or 'auto', got {svgp_solve_mode!r}"
        )
    if cholesky_impl not in ("auto", "xla", "pallas"):
        raise ValueError(
            f"cholesky_impl must be 'auto', 'xla' or 'pallas', got {cholesky_impl!r}"
        )
    if quad_diag_impl == "auto":
        # The fused Pallas quad kernel is measured SLOWER than XLA's fused
        # lowering at every probed scale (quad_pallas_step_ab.json), so
        # auto resolves to the XLA path; "pallas" stays as an explicit
        # opt-in (exact per-tile recompute VJP, minimal HBM).
        quad_diag_impl = "xla"
    if quad_diag_impl not in ("xla", "pallas"):
        raise ValueError(
            f"quad_diag_impl must be 'auto', 'xla' or 'pallas', got {quad_diag_impl!r}"
        )
    if fused_factor_inverse not in ("auto", "fused", "off"):
        raise ValueError(
            "fused_factor_inverse must be 'auto', 'fused' or 'off', got "
            f"{fused_factor_inverse!r}"
        )

    if fixed_view_idx is None:
        fixed = tuple(False for _ in range(n_views))
    else:
        idxs = (
            set(int(i) for i in fixed_view_idx)
            if isinstance(fixed_view_idx, (list, tuple, set, np.ndarray))
            else {int(fixed_view_idx)}
        )
        fixed = tuple(v in idxs for v in range(n_views))

    return ModelSpec(
        modalities=tuple(modalities),
        n_views=n_views,
        n_spatial_dims=n_spatial_dims,
        m_X_per_view=m_X_per_view,
        m_G=m_G,
        kernel_warp=kernel_warp,
        kernel_data=kernel_data,
        mean_function=mean_function,
        n_noise_variance_params=n_noise_variance_params,
        fixed_view_mask=fixed,
        fixed_warp_kernel_variances=fixed_warp_kernel_variances is not None,
        fixed_warp_kernel_lengthscales=fixed_warp_kernel_lengthscales is not None,
        fixed_data_kernel_lengthscales=fixed_data_kernel_lengthscales is not None,
        diagonal_offset=diagonal_offset,
        reference_sample_scale=reference_sample_scale,
        mean_penalty_param=mean_penalty_param,
        data_chunk_size=data_chunk_size,
        analytic_data_likelihood=analytic_data_likelihood,
        svgp_matmul_precision=svgp_matmul_precision,
        svgp_variance_precision=svgp_variance_precision,
        svgp_solve_mode=svgp_solve_mode,
        triangular_variational=triangular_variational,
        whitened_variational=whitened_variational,
        cholesky_impl=cholesky_impl,
        quad_diag_impl=quad_diag_impl,
        fused_factor_inverse=fused_factor_inverse,
    )


# ---------------------------------------------------------------------------
# Host-side packing between the reference layout and the padded layout
# ---------------------------------------------------------------------------


def view_slices(counts: Sequence[int]) -> list:
    """Per-view [start, stop) into the concatenated axis (reference layout)."""
    cs = np.insert(np.cumsum(counts), 0, 0)
    return [(int(cs[i]), int(cs[i + 1])) for i in range(len(counts))]


def create_view_idx_dict(spec: ModelSpec):
    """Reference-parity bookkeeping (gpsa.py:155-183): view_idx, Ns, Ps, n_total."""
    view_idx, Ns, Ps = {}, {}, {}
    n_total = 0
    for mod in spec.modalities:
        slices = view_slices(mod.n_samples)
        view_idx[mod.name] = [np.arange(lo, hi) for lo, hi in slices]
        Ns[mod.name] = int(sum(mod.n_samples))
        Ps[mod.name] = mod.n_outputs
        n_total += Ns[mod.name]
    return view_idx, Ns, Ps, n_total


def pack_coords(spec: ModelSpec, X_spatial: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    """Concatenated (N_mod, D) coords -> padded (V, N_pad, D) per modality."""
    out = {}
    for mod in spec.modalities:
        x = _as_numpy(X_spatial[mod.name]).astype(np.float32)
        padded = np.zeros((spec.n_views, mod.n_padded, spec.n_spatial_dims), np.float32)
        for v, (lo, hi) in enumerate(view_slices(mod.n_samples)):
            padded[v, : hi - lo] = x[lo:hi]
        out[mod.name] = jnp.asarray(padded)
    return out


def pack_batch(spec: ModelSpec, data_dict: Dict[str, dict]) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Full padded batch: coords, outputs, mask per modality."""
    batch = {}
    coords = pack_coords(
        spec, {m: data_dict[m]["spatial_coords"] for m in spec.modality_names}
    )
    for mod in spec.modalities:
        y = _as_numpy(data_dict[mod.name]["outputs"]).astype(np.float32)
        y_pad = np.zeros((spec.n_views, mod.n_padded, mod.n_outputs), np.float32)
        mask = np.zeros((spec.n_views, mod.n_padded), np.float32)
        for v, (lo, hi) in enumerate(view_slices(mod.n_samples)):
            y_pad[v, : hi - lo] = y[lo:hi]
            mask[v, : hi - lo] = 1.0
        batch[mod.name] = {
            "coords": coords[mod.name],
            "outputs": jnp.asarray(y_pad),
            "mask": jnp.asarray(mask),
        }
    return batch


def unpack_points(spec: ModelSpec, mod_name: str, arr) -> np.ndarray:
    """Padded (..., V, N_pad, C) -> reference concatenated (..., N_mod, C)."""
    mod = spec.modality(mod_name)
    arr = np.asarray(arr)
    pieces = [
        arr[..., v, : mod.n_samples[v], :] for v in range(spec.n_views)
    ]
    return np.concatenate(pieces, axis=-2)
