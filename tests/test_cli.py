"""End-to-end tests for the command-line interface (align + predict)."""

import csv
import json

import numpy as np
import pytest

from spatial_alignment_tpu.cli import main


def _write_views(tmp_path, n_genes=3, g=6, warp_sigma=0.1, seed=0):
    rng = np.random.default_rng(seed)
    ax = np.linspace(0, 10, g)
    X1, X2 = np.meshgrid(ax, ax)
    X0 = np.stack([X1.ravel(), X2.ravel()], 1)
    Y0 = np.stack(
        [np.sin(X0[:, 0] * (j + 1) / 3.0) + np.cos(X0[:, 1]) for j in range(n_genes)],
        1,
    )
    X1w = X0 + warp_sigma * rng.standard_normal(X0.shape)
    paths = {}
    for name, x, y in [("a", X0, Y0), ("b", X1w, Y0)]:
        cpath = tmp_path / f"{name}_xy.csv"
        np.savetxt(cpath, x, delimiter=",", header="x,y", comments="")
        ypath = tmp_path / f"{name}.csv"
        with open(ypath, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["spot"] + [f"g{i}" for i in range(n_genes)])
            for i, row in enumerate(y):
                w.writerow([f"s{i}"] + list(row))
        paths[name] = (str(cpath), str(ypath))
    return paths, X0


def _align_args(tmp_path, paths, out, extra=()):
    (ca, ya), (cb, yb) = paths["a"], paths["b"]
    return [
        "align", "--coords", ca, "--counts", ya, "--coords", cb, "--counts", yb,
        "--template", "0", "--m", "10", "--epochs", "150", "--print-every", "100",
        "--out", str(out), *extra,
    ]


def test_cli_align_writes_artifacts(tmp_path, capsys):
    paths, X0 = _write_views(tmp_path)
    out = tmp_path / "out"
    assert main(_align_args(tmp_path, paths, out)) == 0
    for name in ("aligned_coords.csv", "losses.csv", "model.npz", "summary.json"):
        assert (out / name).exists(), name
    summary = json.loads((out / "summary.json").read_text())
    assert summary["n_views"] == 2
    assert np.isfinite(summary["final_neg_elbo"])
    losses = np.loadtxt(out / "losses.csv", skiprows=1)
    assert losses.shape == (150,)
    aligned = np.loadtxt(out / "aligned_coords.csv", delimiter=",", skiprows=1)
    assert aligned.shape == (2 * X0.shape[0], 1 + 2 + 2)  # view, x, aligned_x
    # template view passes through exactly
    v0 = aligned[aligned[:, 0] == 0]
    np.testing.assert_allclose(v0[:, 1:3], v0[:, 3:5], atol=1e-5)


def test_cli_predict_roundtrip(tmp_path):
    paths, X0 = _write_views(tmp_path)
    out = tmp_path / "out"
    main(_align_args(tmp_path, paths, out))

    new = tmp_path / "new_xy.csv"
    np.savetxt(new, X0[:7] + 0.05, delimiter=",", header="x,y", comments="")
    (ca, ya), (cb, yb) = paths["a"], paths["b"]
    pred_out = tmp_path / "pred"
    rc = main([
        "predict", "--coords", ca, "--counts", ya, "--coords", cb, "--counts", yb,
        "--template", "0", "--m", "10", "--checkpoint", str(out / "model.npz"),
        "--at", str(new), "--out", str(pred_out),
    ])
    assert rc == 0
    mu = np.loadtxt(pred_out / "pred_mean.csv", delimiter=",")
    var = np.loadtxt(pred_out / "pred_var.csv", delimiter=",")
    assert mu.shape == (14, 3) and var.shape == (14, 3)  # 7 points x 2 views
    assert np.isfinite(mu).all() and (var > 0).all()


def test_cli_predict_from_checkpoint_alone(tmp_path):
    """predict needs ONLY the checkpoint: spec + data embedded (round 3);
    no model flags, no data files (ADVICE r2 medium)."""
    paths, X0 = _write_views(tmp_path)
    out = tmp_path / "out"
    main(_align_args(tmp_path, paths, out, extra=("--triangular",)))
    pred_out = tmp_path / "pred_ckpt_only"
    rc = main([
        "predict", "--checkpoint", str(out / "model.npz"), "--out", str(pred_out),
    ])
    assert rc == 0
    mu = np.loadtxt(pred_out / "pred_mean.csv", delimiter=",")
    aligned = np.loadtxt(pred_out / "aligned_coords.csv", delimiter=",", skiprows=1)
    assert mu.shape == (2 * X0.shape[0], 3)
    assert aligned.shape == (2 * X0.shape[0], 2)
    assert np.isfinite(mu).all()
    # the triangular_variational flag travels in the spec — predictions from
    # the checkpoint-only path must match an in-process predict
    import spatial_alignment_tpu as sat

    model = sat.VariationalGPSA.load(str(out / "model.npz"))
    assert model.spec.triangular_variational is True


def test_cli_h5ad_input(tmp_path):
    h5py = pytest.importorskip("h5py")
    paths, X0 = _write_views(tmp_path)
    n = X0.shape[0]
    Y = np.loadtxt(paths["a"][1], delimiter=",", skiprows=1, usecols=(1, 2, 3))
    with h5py.File(tmp_path / "d.h5ad", "w") as f:
        f["X"] = np.concatenate([Y, Y]).astype(np.float32)
        f["obsm/spatial"] = np.concatenate(
            [X0, np.loadtxt(paths["b"][0], delimiter=",", skiprows=1)]
        ).astype(np.float32)
        f["obs/batch"] = np.array([0] * n + [1] * n)
    out = tmp_path / "out_h5"
    rc = main([
        "align", "--h5ad", str(tmp_path / "d.h5ad"), "--m", "10",
        "--epochs", "100", "--out", str(out),
    ])
    assert rc == 0
    summary = json.loads((out / "summary.json").read_text())
    assert summary["n_samples_list"] == [n, n]


def test_cli_errors(tmp_path):
    with pytest.raises(SystemExit):
        main(["align", "--coords", "x.csv", "--out", str(tmp_path)])  # no counts


def test_cli_predict_view_count_mismatch_errors(tmp_path):
    """A 2-view checkpoint driven with a 1-view input file must fail with a
    clear view-count message, not an IndexError or silent mis-assignment
    (round-3 review finding)."""
    paths, X0 = _write_views(tmp_path)
    out = tmp_path / "out"
    main(_align_args(tmp_path, paths, out))
    (ca, ya), _ = paths["a"], paths["b"]
    with pytest.raises(SystemExit, match="view-count mismatch"):
        main([
            "predict", "--coords", ca, "--counts", ya,
            "--checkpoint", str(out / "model.npz"),
            "--out", str(tmp_path / "pred_bad"),
        ])
