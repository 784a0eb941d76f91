"""Reference-compatible import surface: a user of the reference package can
switch imports from ``poor_man_gplvm`` to ``poor_man_gplvm_tpu`` and find
every module/function (reference poor_man_gplvm/__init__.py:6-12 and the
per-module public symbols from SURVEY.md §2)."""

import jax.numpy as jnp
import numpy as np
import pytest

import poor_man_gplvm_tpu as pmg


def test_toplevel_classes():
    for name in [
        "AbstractGPLVM1D", "AbstractGPLVMJump1D", "PoissonGPLVM1D",
        "GaussianGPLVM1D", "PoissonGPLVMJump1D", "GaussianGPLVMJump1D",
        "generate_basis",
    ]:
        assert hasattr(pmg, name)


def test_reference_submodules_present():
    for name in [
        "core", "test", "utils", "model_selection_helper", "experimental",
        "plot_helper", "analysis_helper", "distance_analysis",
        "gp_kernel", "decoder", "decoder_latentonly", "fit_tuning_helper",
        "initializer", "reactivation_analysis", "trial_analysis",
        "pandas_util", "verify_latent_jump",
    ]:
        assert hasattr(pmg, name), name


def test_module_symbols():
    assert callable(pmg.gp_kernel.create_transition_prob_1d)
    assert callable(pmg.gp_kernel.rbf_kernel)
    assert callable(pmg.decoder.smooth_all_step_combined_ma_chunk)
    assert callable(pmg.decoder.get_naive_bayes_ma_chunk)
    assert callable(pmg.decoder.compute_transition_posterior_prob)
    assert callable(
        pmg.decoder_latentonly.smooth_all_step_combined_ma_chunk_latent
    )
    assert callable(pmg.fit_tuning_helper.make_adam_runner)
    assert callable(pmg.fit_tuning_helper.poisson_m_step_objective)
    assert callable(pmg.model_selection_helper.model_selection_one_split)
    assert callable(pmg.model_selection_helper.get_jump_consensus)
    assert callable(pmg.test.circular_shuffle_data)
    assert callable(pmg.test.compute_entropy)
    assert callable(pmg.utils.post_fit_sort_neuron)
    assert callable(pmg.utils.rbf_kernel)
    assert callable(pmg.initializer.init_with_pca)
    assert callable(pmg.analysis_helper.get_posterior_weighted_average)
    assert callable(pmg.distance_analysis.compute_distance_lag)
    assert callable(pmg.reactivation_analysis.decode_pre_post)
    assert callable(pmg.pandas_util.filter_df_with_spec)
    assert callable(pmg.verify_latent_jump.segment_trial_by_jump)
    assert callable(pmg.plot_helper.plot_pynapple_data_mpl)
    assert hasattr(pmg.experimental, "PoissonGPLVMGain1D_gain")
    assert callable(pmg.model_selection_helper.default_fit_kwargs.get)


def test_decoder_compat_wrappers_run():
    """The reference-style functional decoder entry points execute and match
    the class path."""
    import jax.random as jr

    model = pmg.PoissonGPLVMJump1D(6, n_latent_bin=8, tuning_lengthscale=2.0)
    _, y = model.sample(40, key=jr.PRNGKey(0))

    from poor_man_gplvm_tpu.ops import kernels as gpk

    _, log_lat_l, _, log_dyn = gpk.create_transition_prob_1d(
        jnp.arange(8), jnp.arange(2), 1.0, 0.01, 0.01
    )
    out = pmg.decoder.smooth_all_step_combined_ma_chunk(
        y, model.tuning, {}, log_lat_l, log_dyn, jnp.ones(6), jnp.ones(8)
    )
    assert len(out) == 6
    res_cls = model.decode_latent(y)
    np.testing.assert_allclose(
        float(out[1]), res_cls["log_marginal_final"], rtol=1e-5
    )

    filt = pmg.decoder.filter_all_step_combined_ma(
        y, model.tuning, {}, log_lat_l, log_dyn, jnp.ones(6), jnp.ones(8)
    )
    assert len(filt) == 5

    # latent-only wrappers
    kern, log_kern = gpk.create_transition_prob_latent_1d(jnp.arange(8), 1.0)
    out_lat = pmg.decoder_latentonly.smooth_all_step_combined_ma_chunk_latent(
        y, model.tuning, {}, log_kern, jnp.ones(6), jnp.ones(8)
    )
    assert len(out_lat) == 6
    trans_res = pmg.decoder_latentonly.compute_transition_posterior_prob_latent(
        out_lat[4]
    )
    assert "p_transition_latent" in trans_res


def test_low_level_decoder_primitives():
    """The reference's per-step/per-chunk decoder primitives run and are
    self-consistent with the combined chunked driver."""
    import jax.random as jr
    from poor_man_gplvm_tpu.ops import emissions, kernels as gpk

    L, N, T = 6, 5, 15
    model = pmg.PoissonGPLVMJump1D(N, n_latent_bin=L, tuning_lengthscale=2.0)
    _, y = model.sample(T, key=jr.PRNGKey(0))
    _, log_lat_l, _, log_dyn = gpk.create_transition_prob_1d(
        jnp.arange(L), jnp.arange(2), 1.0, 0.01, 0.01
    )
    ll = emissions.get_loglikelihood_ma_all(
        y, model.tuning, {}, jnp.ones((T, N)), jnp.ones(L)
    )
    post, lml, prior, ratios = pmg.decoder.filter_all_step(
        ll, log_lat_l, log_dyn
    )
    assert post.shape == (T, 2, L)
    smooth, acc = pmg.decoder.smooth_all_step(
        post, prior[1:], log_lat_l, log_dyn
    )
    assert smooth.shape == (T, 2, L)
    ref = pmg.decoder.smooth_all_step_combined_ma_chunk(
        y, model.tuning, {}, log_lat_l, log_dyn, jnp.ones(N), jnp.ones(L),
        engine="log",
    )
    np.testing.assert_allclose(
        np.asarray(smooth), np.asarray(ref[0]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(lml), float(ref[1]), rtol=1e-6)

    # single-step primitives
    ll_single = pmg.decoder.get_loglikelihood_ma_poisson(
        y[0], model.tuning, {}, jnp.ones(N), jnp.ones(L)
    )
    np.testing.assert_allclose(np.asarray(ll_single), np.asarray(ll[0]),
                               rtol=1e-5)
    carry = (
        jnp.log(jnp.ones((2, L)) / (2 * L)), jnp.array(0.0)
    )
    carry2, (p1, pr1, r1) = pmg.decoder.filter_one_step(
        carry, ll[0], log_lat_l, log_dyn
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(post[0]), rtol=1e-5)


def test_gap_fill_surface():
    """Remaining reference public symbols: gp_kernel.get_log, latent-only
    low-level decoders, get_s_b, experimental functional API, backup plot
    helpers."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    # get_log clamps -inf
    lv = pmg.gp_kernel.get_log(jnp.array([1.0, 0.0]))
    assert float(lv[0]) == 0.0 and float(lv[1]) == -10000.0

    # latent-only low-level: hand loop == vectorized
    L, T = 6, 12
    from poor_man_gplvm_tpu.ops import kernels as gpk
    _, log_kern = gpk.create_transition_prob_latent_1d(jnp.arange(L), 1.0)
    rng = np.random.default_rng(0)
    ll = jnp.asarray(rng.normal(size=(T, L)).astype(np.float32))
    post, lml, prior, ratios = pmg.decoder_latentonly.filter_all_step_latent(
        ll, log_kern
    )
    carry = (jnp.log(jnp.ones(L) / L), jnp.array(0.0))
    for t in range(T):
        carry, (p, _, _) = pmg.decoder_latentonly.filter_one_step_latent(
            carry, ll[t], log_kern
        )
    np.testing.assert_allclose(np.asarray(p), np.asarray(post[-1]), rtol=1e-5)
    smooth, acc = pmg.decoder_latentonly.smooth_all_step_latent(
        post, prior[1:], log_kern
    )
    assert smooth.shape == (T, L) and acc.shape == (L, L)

    # get_s_b == get_statistics y_weighted; the reference-named top-level
    # shim must expose the same module surface
    import poor_man_gplvm_tpu.fit_tuning_with_basis as ftb_shim
    assert ftb_shim.glm_get_tuning is not None
    from poor_man_gplvm_tpu.ops import fit_tuning_with_basis as ftb
    assert ftb_shim.get_s_b is ftb.get_s_b
    from poor_man_gplvm_tpu.ops import mstep
    spk = jnp.asarray(rng.poisson(1.0, (T, 4)).astype(np.float32))
    logp = jnp.log(jnp.asarray(rng.dirichlet(np.ones(L), T).astype(np.float32)))
    yw, tw = mstep.get_statistics(logp, spk)
    np.testing.assert_allclose(
        np.asarray(ftb.get_s_b(spk, jnp.exp(logp))), np.asarray(yw), rtol=1e-4
    )

    # experimental functional API: gain folds into changing-dt
    from poor_man_gplvm_tpu.experimental import decoder_exp
    tun = jnp.asarray(rng.random((L, 4)).astype(np.float32))
    gain = jnp.asarray(rng.uniform(0.5, 2.0, T).astype(np.float32))
    llg = decoder_exp.get_loglikelihood_ma_all_gain(
        spk, tun, {}, jnp.ones(4), jnp.ones(L), gain
    )
    from poor_man_gplvm_tpu.ops.emissions import (
        get_loglikelihood_ma_all_changing_dt,
    )
    np.testing.assert_allclose(
        np.asarray(llg),
        np.asarray(get_loglikelihood_ma_all_changing_dt(
            spk, tun, {}, jnp.ones((T, 4)), jnp.ones(L), gain)),
        rtol=1e-5,
    )
    nb = decoder_exp.get_naive_bayes_ma_chunk_gain(
        spk, tun, {}, jnp.ones(4), jnp.ones(L), gain_l=gain,
        n_time_per_chunk=5,
    )
    assert nb[0].shape == (T, L)
    from poor_man_gplvm_tpu.experimental import fit_tuning_helper_exp
    g1 = fit_tuning_helper_exp.get_gain_mstep_single_time(
        spk[0], logp[0], tun
    )
    from poor_man_gplvm_tpu.experimental.gain import get_gain_mstep
    np.testing.assert_allclose(
        float(g1), float(get_gain_mstep(spk[:1], logp[:1], tun)[0]), rtol=1e-5
    )

    # backup plot helpers smoke
    from poor_man_gplvm_tpu import plotting as P
    lin = rng.uniform(0, 222, 50)
    cit, leg, secs, cols = P.color_arms(lin)
    assert len(leg) == 5 and (cit != 0).all()
    mit, legm, _, _ = P.marker_speed(rng.uniform(0, 50, 50))
    assert len(legm) == 4
    df = pd.DataFrame(rng.random((8, 10)))
    fig, ax = P.mean_error_plot(df)
    fig, ax = P.heatmap(df)
    fig, ax = P.ratemap_one_raw(df, trial=3, field_bound=(2, 7))
    fig, ax = P.box_strip_plot(pd.DataFrame({"a": rng.random(10),
                                             "b": rng.random(10)}), "a", "b")
    fig, ax = P.plot_legend(["x", "y"], handle_types=["line", "patch"])
    fig, ax = P.plot_shades(np.array([0, 0, 1, 1, 0, 2, 2]))
    fig, ax = P.plot_angle(rng.uniform(0, 2 * np.pi, 40), ds_fac=4)
    assert P.star_map(0.2) == "n.s." and P.star_map(1e-5) == "****"
    res = P.consecutive_wilcoxon_test(pd.DataFrame(rng.random((20, 3)),
                                                   columns=list("abc")))
    assert len(res) == 2
    c = P.prep_color(np.arange(10))
    assert c.shape == (10, 4)
    plt.close("all")


def test_reference_public_name_diff_empty():
    """Every public top-level def/class in the reference package has a
    same-named counterpart somewhere in poor_man_gplvm_tpu (AST name diff;
    VERDICT round-2 missing #1).  The only exemption is the reference's
    own empty stub."""
    import ast
    import pathlib

    ref_pkg = pathlib.Path("/root/reference/poor_man_gplvm")
    if not ref_pkg.is_dir():
        pytest.skip("reference checkout not available")

    def public_names(root):
        names = set()
        for p in root.rglob("*.py"):
            try:
                tree = ast.parse(p.read_text())
            except SyntaxError:
                continue
            for node in tree.body:
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                     ast.ClassDef)):
                    if not node.name.startswith("_"):
                        names.add(node.name)
        return names

    import poor_man_gplvm_tpu
    repo_pkg = pathlib.Path(poor_man_gplvm_tpu.__file__).parent

    # reference's within_nrem_interval_ach_induced_latent_ramp_analysis is a
    # bare `pass` stub (post_fit_ach_dataset.py:495-500) — nothing to port
    exempt = {"within_nrem_interval_ach_induced_latent_ramp_analysis"}
    missing = public_names(ref_pkg) - public_names(repo_pkg) - exempt
    assert not missing, f"reference public names absent from repo: {sorted(missing)}"
