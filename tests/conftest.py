"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding tests run on this virtual mesh (the real environment has a
single TPU chip); numerical tests also run on CPU for determinism.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox boots jax with a TPU plugin from sitecustomize before conftest
# runs, so the env vars above are not enough — override the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# -- smoke tier ---------------------------------------------------------------
# `pytest -m smoke` is the pre-commit gate: one (or a few) fast happy-path
# tests per subsystem, selected here centrally so the list is auditable and
# tunable in one place. The full suite stays the milestone gate (CLAUDE.md).
# Matching is EXACT: a `*.py` entry marks that whole module; any other entry
# marks exactly that test (plus its parametrized variants) — a future
# `test_roundtrip_large` must not silently join the gate because
# `test_roundtrip` is listed (review finding, round 4).
_SMOKE = [
    # semantic cores (golden fixtures)
    "test_golden.py::test_golden_outputs",
    "test_phase2_golden.py::test_phase2_golden_trajectory",
    # geometry / losses / model
    "test_geometry.py",
    "test_losses.py::test_mpjpe_is_mean_over_joints",
    "test_model.py::TestPHD::test_forward_shapes",
    "test_model.py::TestCausalConvOp::test_left_edge_padding_is_replicate",
    # ingestion -> clips -> augmentation
    "test_ingest.py::TestIngest::test_full_tree",
    "test_clips_api.py::TestPreprocessedClips::test_plain_item",
    "test_augment.py::TestYIQHue::test_zero_shift_identity",
    "test_preprocess.py::TestResizeBilinear::test_matches_torch",
    # extraction (per-clip + dedup schedulers, sharded backbone)
    "test_extract.py::test_feature_fn_mesh_dp_matches_single_device",
    "test_dedup.py::test_dedup_store_matches_per_clip_exactly",
    # storage / sampler / feed
    "test_fp16_store.py::test_fp16_write_read_roundtrip",
    "test_shards.py::TestShardFile::test_roundtrip",
    "test_shards.py::TestVerifyStore::test_clean_store_verifies",
    "test_sampler.py::TestMixedShardBatchSampler::test_batches_cover_k_shards",
    "test_utils.py::TestFeedTransform::test_transform_applied_before_transfer",
    # training (phase 1 + 2, parallel, loop, checkpoint)
    "test_train_step.py::TestTrainStep::test_loss_decreases",
    "test_train_step.py::TestCheckpoint::test_load_params_only",
    "test_train_step.py::TestCheckpoint::test_load_params_only_orbax_directory",
    "test_phase2.py::TestPhase2Step::test_only_far_updates",
    "test_parallel.py::TestDataParallelStep::test_dp_matches_single_device",
    "test_loop_e2e.py::test_fit_end_to_end",
    "test_robustness.py::TestCheckpointManifest::test_manifest_readable_standalone",
    # results / viz / export / serve
    "test_results_viz.py::TestEvaluateTest::test_metrics_finite_and_consistent",
    "test_export.py::TestForwardArtifact::test_symbolic_batch_matches_model_apply",
    "test_serve.py::TestRollout::test_context_joints_match_model",
    "test_serve_daemon.py::test_concurrent_requests_batched_and_correct",
    # native lib + pallas kernels
    "test_native.py::TestCropResize::test_matches_cv2",
    "test_native.py::TestFullJitter::test_hue_only_matches_np_hue_exactly",
    "test_pallas.py::TestFusedInferenceEngine::test_matches_model_apply",
    "test_pallas_bottleneck.py",
    # backbone + conversion + CLI plumbing
    "test_resnet.py::TestOpSemanticsVsTorch::test_maxpool_3x3_stride2_pad1",
    "test_resnet_opt.py::test_space_to_depth_layout",
    "test_phd_import.py::TestPHDConversion::test_converted_model_runs",
    "test_cli.py::TestModelConfigResolution::test_resolver_precedence_and_conflict",
    # full CLI pipeline e2e (extract -> train -> results)
    "test_full_pipeline.py::test_extract_train_results",
    # measurement gates of record (--recompute CLI round trips)
    "test_jitter_experiment_stats.py::test_recompute_cli_roundtrip",
    "test_phase2_value_stats.py::test_recompute_cli_roundtrip",
]


def _smoke_match(pat, nodeid):
    mod, _, rest = nodeid.partition("::")
    nid = mod.rsplit("/", 1)[-1] + ("::" + rest if rest else "")
    if pat.endswith(".py") and "::" not in pat:
        return nid.partition("::")[0] == pat
    return nid == pat or nid.startswith(pat + "[")


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        for pat in _SMOKE:
            if _smoke_match(pat, item.nodeid):
                item.add_marker(pytest.mark.smoke)
                matched.add(pat)
    # A renamed/deleted test must fail the gate loudly, not silently shrink
    # it (review finding, round 4). Only enforced on full collection — a
    # targeted `pytest tests/test_x.py` run legitimately misses patterns.
    if not config.args or config.args == [str(config.rootpath / "tests")] \
            or config.args == ["tests/"] or config.args == ["tests"]:
        stale = [p for p in _SMOKE if p not in matched]
        if stale:
            raise pytest.UsageError(
                f"_SMOKE patterns match no collected test: {stale} — "
                "update tests/conftest.py after renaming/moving tests")
