"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU chip (axon) is reserved for benches; tests must be hermetic and
exercise multi-device sharding, so we force the CPU backend with 8 virtual
devices (SURVEY.md §4 item f).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


# Curated quick subset: the cheapest test(s) of every module, selected from a
# measured full-suite --durations=0 run so `pytest -m quick` covers every
# subsystem in ~3 minutes on an idle host (the full suite takes ~30+ min on
# this 1-core host). Regenerate by re-running the suite with --durations=0
# and re-curating; tests not listed simply run only in the full suite.
_QUICK_TESTS = {
    "test_bar_distribution.py::test_bucket_mapping_edges",
    "test_bar_distribution.py::test_cdf_icdf_roundtrip",
    "test_bar_distribution.py::test_density_integrates_to_one",
    "test_bar_distribution.py::test_ei_maximize",
    "test_bar_distribution.py::test_full_support_density_integrates_to_one",
    "test_bar_distribution.py::test_full_support_mean_tail_adjustment",
    "test_bar_distribution.py::test_full_support_nll_tails",
    "test_bar_distribution.py::test_get_bucket_limits_equal_mass",
    "test_bar_distribution.py::test_get_bucket_limits_range",
    "test_bar_distribution.py::test_mean_mode",
    "test_bar_distribution.py::test_nll_matches_hand_computed_density",
    "test_bar_distribution.py::test_quantile_interval",
    "test_bar_distribution.py::test_sampling_matches_distribution",
    "test_bayesopt.py::test_ei_prefers_high_mean_bucket",
    "test_bench_harness.py::test_retry_recovers_after_transient_failures",
    "test_bench_harness.py::test_retry_exhaustion_reports_structured_error",
    "test_bayesopt.py::test_pi_monotone_in_best_f",
    "test_bayesopt.py::test_scores_jit_stable_across_num_obs",
    "test_checkpoints.py::test_torch_export_roundtrip",
    "test_durable_ckpt.py::test_save_restore_roundtrip",
    "test_durable_ckpt.py::test_bounded_history_one_reachable_snapshot",
    "test_durable_ckpt.py::test_main_branch_untouched_and_index_clean",
    "test_durable_ckpt.py::test_slots_are_independent",
    "test_durable_ckpt.py::test_restore_missing_slot_fails",
    "test_durable_ckpt.py::test_save_missing_dir_fails",
    "test_comparison.py::test_conf_interval",
    "test_compat.py::test_namespace_surface",
    "test_compat.py::test_gp_fitting_workflow_runs_unchanged",
    "test_compat.py::test_unsupported_surface_raises_not_silently",
    "test_debug_checks.py::test_nll_poisons_out_of_support_only_in_debug_mode",
    "test_debug_checks.py::test_in_support_targets_unaffected_by_debug_mode",
    "test_comparison.py::test_log_joint_finite_and_peaked_at_truth",
    "test_config.py::test_yaml_roundtrip",
    "test_flash_attention.py::test_flash_bf16_close_to_f32_dense",
    "test_flash_attention.py::test_flash_forward_matches_dense[100-0]",
    "test_flash_attention.py::test_flash_forward_traced_sep",
    "test_gp_mix_oracles.py::test_hyperprior_finite_and_peaked",
    "test_host_data_training.py::test_host_iter_rejects_chunking",
    "test_inference.py::test_hmc_correlated_gaussian",
    "test_inference.py::test_hmc_recovers_conjugate_gaussian",
    "test_inference.py::test_svgd_gaussian_moments",
    "test_inference_api.py::test_feature_padding",
    "test_inference_api.py::test_regressor_rejects_classifier_heads",
    "test_losses.py::test_ce_valid_weight_masks_ignore_index",
    "test_model.py::test_dense_attention_reference_softmax_rows",
    "test_model.py::test_eval_labels_are_invisible",
    "test_model.py::test_eval_points_do_not_influence_each_other",
    "test_model.py::test_gaussian_head_two_outputs",
    "test_model.py::test_pfn_mask_structure",
    "test_model.py::test_positional_encodings_apply[learned]",
    "test_model.py::test_positional_encodings_apply[sinus]",
    "test_model.py::test_traced_sep_equals_static_sep",
    "test_model.py::test_train_points_influence_everything",
    "test_model.py::test_zero_init_makes_layers_identity_at_init",
    "test_moe.py::test_ep_param_sharding_rules",
    "test_native_cache.py::test_prefetch_iterator_preserves_stream",
    "test_native_cache.py::test_write_prior_cache_and_cached_prior",
    "test_omniglot.py::test_translate_keeps_ink_mass",
    "test_oracles.py::test_bayes_linreg_posterior_shrinks",
    "test_oracles.py::test_gp_posterior_single_point_analytic",
    "test_oracles.py::test_ridge_evaluate_matches_sklearn",
    "test_pipeline.py::test_pipeline_forward_matches_reference",
    "test_presentation.py::test_heatmap_with_box_sizes_draws_mesh",
    "test_presentation.py::test_plot_bar_distribution_sorts_and_densifies",
    "test_presentation.py::test_plot_model_and_orig_curve",
    "test_presentation.py::test_plot_model_w_eval_pos_windowed",
    "test_priors.py::test_gp_prior_long_sequence_finite",
    "test_priors.py::test_kernels_basic_properties",
    "test_priors.py::test_module_prior_custom_sampler",
    "test_priors.py::test_prior_sampling_is_jittable_and_deterministic",
    "test_priors.py::test_ridge_shapes_and_stats",
    "test_profiling.py::test_annotate_runs",
    "test_profiling.py::test_debug_nans_scoped",
    "test_profiling.py::test_step_timers_channels",
    "test_resume.py::test_completed_run_is_noop_on_resume",
    "test_review_fixes.py::test_bucket_limits_duplicate_ys_yield_strictly_increasing_borders",
    "test_review_fixes.py::test_eval_pos_registry_is_consulted",
    "test_review_fixes.py::test_seqbn_normalizes_current_batch",
    "test_review_fixes.py::test_tabular_pfn_uses_context_stats",
    "test_sharding.py::test_fsdp_param_sharding_rules",
    "test_sharding.py::test_param_sharding_rules",
    "test_sklearn_crosscheck.py::test_ridge_evaluate_matches_sklearn_refit",
    "test_stroke.py::test_labels_are_classes",
    "test_tabular.py::test_baseline_hist_gb_beats_chance",
    "test_tabular.py::test_baseline_knn_beats_chance",
    "test_tabular.py::test_build_windows_seeded",
    "test_tabular.py::test_local_datasets_load",
    "test_tabular.py::test_reference_benchmark_loads_all_nine",
    "test_train.py::test_positional_loss_bookkeeping",
    "test_train_chunked.py::test_chunk_divisibility_enforced",
    "test_validate_hook.py::test_validator_runs_and_improves_with_training",
}


# Slow tier: every test (or expensive-fixture consumer) measured >= ~15 s in
# a full-suite --durations=40 run on this 1-core host (2026-08-18, run under
# background load — idle times are ~25% lower). `-m "not slow"` is the mid
# tier: full-suite coverage minus these, ~8 min idle; `-m quick` stays the
# default loop; the full suite (no -m) runs everything. Base names — a slow
# parametrized test is slow for all params.
_SLOW_TESTS = {
    "test_bayesopt.py::test_bo_loop_beats_random_on_smooth_objective",
    "test_checkpoints.py::test_warm_start_through_train",
    "test_comparison.py::test_eval_mcmc_matches_svi_when_converged",
    "test_comparison.py::test_eval_svi_beats_chance",
    "test_comparison.py::test_trained_pfn_approaches_svi_quality",
    "test_comparison.py::test_training_steps_sweep_caches",
    "test_debug_checks.py::test_out_of_support_raises_under_debug_mode",
    "test_flash_attention.py::test_flash_large_batch_heads_uses_256_block",
    "test_fused_apply.py::test_fused_forward_gradients_match_model",
    "test_fused_layer.py::test_fused_gradients_match_flax",
    "test_gp_mix_oracles.py::test_hyper_mcmc_predictive_beats_bad_hypers",
    "test_host_data_training.py::test_host_iter_training_learns",
    "test_inference.py::test_bnn_classifier_learns_separable_data",
    "test_inference_api.py::test_classifier_separable",
    "test_inference_api.py::test_regressor_interpolates_context",
    "test_model.py::test_output_shape_all_positions",
    "test_moe.py::test_ep_training_matches_single_device",
    "test_moe.py::test_moe_training_runs_and_learns",
    "test_omniglot.py::test_episode_shapes_and_targets",
    "test_omniglot.py::test_query_class_is_among_support",
    "test_omniglot.py::test_synthetic_bank_shapes",
    "test_pipeline.py::test_pipeline_grads_match_reference",
    "test_pipeline.py::test_pp_train_step_runs",
    "test_priors.py::test_mlp_prior_binary_classification",
    "test_priors.py::test_mlp_prior_categorical_discrete_marginals",
    "test_priors.py::test_mlp_prior_causal_mode",
    "test_priors.py::test_mlp_prior_shapes_and_normalization",
    "test_resume.py::test_resume_reproduces_uninterrupted_run",
    "test_review_fixes.py::test_group_priors_accept_odd_batch_sizes",
    "test_sharding.py::test_dp_tp_training_runs",
    "test_sharding.py::test_dp_training_runs_and_matches_single_device",
    "test_sharding.py::test_fsdp_training_matches_single_device",
    "test_sharding.py::test_sharded_attention_gradients_match_reference",
    "test_sharding.py::test_sp_training_matches_single_device",
    "test_stroke.py::test_normalize_x",
    "test_stroke.py::test_only_train_for_last_idx",
    "test_stroke.py::test_same_class_images_differ_but_share_structure",
    "test_stroke.py::test_shapes_and_ranges",
    "test_tabular.py::test_pfn_ensemble_predictions",
    "test_tabular.py::test_pfn_tabular_branch_runs",
    "test_train.py::test_eval_harness_runs",
    "test_train_chunked.py::test_chunked_matches_unchunked_statistically",
    # Second tranche (9-21 s measured in the first `-m "not slow"` pass,
    # 2026-08-18): pulls the mid tier to ~8 min idle. Quick-tier members are
    # never marked slow (the tiers must nest: quick ⊂ not-slow ⊂ full).
    "test_config.py::test_cli_end_to_end_tiny_train",
    "test_debug_checks.py::test_out_of_support_trains_silently_without_debug_mode",
    "test_fused_apply.py::test_fused_forward_matches_model",
    "test_host_data_training.py::test_host_iter_with_grad_accumulation",
    "test_inference_api.py::test_from_checkpoint",
    "test_inference_api.py::test_regressor_nll_and_samples",
    "test_inference_api.py::test_regressor_quantiles_and_std",
    "test_losses.py::test_ce_ignore_index_loss_scale_matches_fixed_pos",
    "test_omniglot.py::test_alphabet_grouped_episodes",
    "test_omniglot.py::test_load_omniglot_class_bank_from_disk",
    "test_omniglot.py::test_seq_len_divisibility",
    "test_omniglot.py::test_translations_off_is_deterministic_bank_content",
    "test_omniglot.py::test_validate_hook_untrained_is_chance",
    "test_oracles.py::test_f64_oracle_reaches_noise_floor_large_context",
    "test_oracles.py::test_gp_posterior_context_mask_equals_subset",
    "test_priors.py::test_gp_marginal_variance_and_kernel",
    "test_priors.py::test_gp_mix_fix_to_range",
    "test_priors.py::test_gp_mix_group_sharing_and_range",
    "test_priors.py::test_gp_mix_sigmoid_and_minmax",
    "test_priors.py::test_mlp_prior_categorical_discretization_semantics",
    "test_review_fixes.py::test_seqbn_with_dropout_trains",
    "test_stroke.py::test_seq_len_constraint",
    "test_tabular.py::test_bnn_svi_classifier_learns_and_caches_compiles",
    "test_tabular.py::test_evaluate_sweep_with_cache",
    "test_train.py::test_training_reduces_loss_ridge",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{item.fspath.basename}::{item.name}"
        if key in _QUICK_TESTS:
            item.add_marker(pytest.mark.quick)
        base = f"{item.fspath.basename}::{item.name.split('[')[0]}"
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
