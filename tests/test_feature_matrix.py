"""Feature-interaction matrix: every spec/fit option combination must train,
predict, and checkpoint-round-trip.

Each option is tested in isolation elsewhere; a framework's failure mode is
the UNTESTED PAIR (e.g. a variational parameterization that breaks the
minibatch mask weighting, or a chunked data layer whose spec doesn't
serialize). This sweeps the pairwise-representative corner set on a tiny
config: fit a few epochs (finite, decreasing loss), run the deterministic
predict, and round-trip through a self-contained checkpoint.
"""

import numpy as np
import pytest

import spatial_alignment_tpu as sat

from conftest import make_two_view_data

COMBOS = [
    # (constructor overrides, fit overrides)
    ({"triangular_variational": True}, {"minibatch_size": 8}),
    ({"whitened_variational": True}, {"minibatch_size": 8}),
    ({"analytic_data_likelihood": True}, {"minibatch_size": 8}),
    ({"triangular_variational": True, "analytic_data_likelihood": True}, {}),
    ({"whitened_variational": True, "fixed_view_idx": 0}, {}),
    ({"triangular_variational": True, "fixed_view_idx": 0},
     {"recipe": "accurate"}),
    ({"data_chunk_size": 16}, {"minibatch_size": 8}),
    ({"data_chunk_size": 16, "analytic_data_likelihood": True}, {}),
    ({"n_latent_gps": {"expression": 2}, "fixed_view_idx": 0},
     {"minibatch_size": 8, "recipe": "accurate"}),
    ({"kernel_func_warp": "matern32", "kernel_func_data": "matern12"},
     {"average_last": 5}),
]


def _ids():
    out = []
    for ctor, fit in COMBOS:
        parts = [k if v is True else f"{k}={v}" for k, v in ctor.items()]
        parts += [f"fit:{k}={v}" for k, v in fit.items()]
        out.append("+".join(str(p) for p in parts))
    return out


@pytest.mark.parametrize("ctor_kw,fit_kw", COMBOS, ids=_ids())
def test_feature_combo_trains_predicts_roundtrips(
    tmp_path, two_view_data, ctor_kw, fit_kw
):
    ctor = {
        "m_X_per_view": 6,
        "m_G": 6,
        "n_latent_gps": {m: None for m in two_view_data},
        "seed": 0,
    }
    ctor.update(ctor_kw)
    model = sat.VariationalGPSA(two_view_data, **ctor)
    losses = model.fit(n_epochs=30, lr=1e-2, S=2, **fit_kw)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    X = {
        m: np.asarray(two_view_data[m]["spatial_coords"], np.float32)
        for m in two_view_data
    }
    G, F, Fv = model.predict(X)
    for m in two_view_data:
        assert np.isfinite(np.asarray(G[m])).all()
        assert np.isfinite(np.asarray(F[m])).all()
        assert (np.asarray(Fv[m]) > 0).all()

    # Self-contained checkpoint round-trip: the spec (including every flag
    # above) must serialize, and the restored model must predict identically.
    path = str(tmp_path / "combo.npz")
    model.save(path)
    model2 = sat.VariationalGPSA.load(path)
    assert model2.spec == model.spec
    G2, F2, _ = model2.predict(X)
    for m in two_view_data:
        np.testing.assert_allclose(
            np.asarray(G2[m]), np.asarray(G[m]), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(F2[m]), np.asarray(F[m]), rtol=1e-5, atol=1e-5
        )
