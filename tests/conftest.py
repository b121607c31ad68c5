"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This gives every test run deterministic multi-device semantics without TPU
hardware (the capability the reference's DDP stack lacks — SURVEY.md §4).
The axon site hook pins JAX_PLATFORMS=axon via sitecustomize, so the env var
alone is not enough — we must update jax.config before any backend init.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Compile-heavy tests (full-model XLA builds take 10-200 s on CPU). The fast
# tier `pytest -m "not slow"` stays under ~2 minutes; CI/driver windows run
# that first and the slow tier separately.
SLOW_NODES = (
    "test_builder.py::test_build_and_forward",
    "test_builder.py::test_decode_shapes_and_ranges",
    "test_builder.py::test_tta_augmented_inference",
    "test_builder.py::test_train_mode_returns_batch_stats",
    "test_builder.py::test_classification_model_from_backbone",
    "test_train_step.py::test_train_step_runs_and_descends",
    "test_train_step.py::test_train_step_on_mesh",
    "test_train_step.py::test_mesh_matches_single_device",
    "test_train_step.py::test_grad_accumulation",
    "test_train_step.py::test_freeze_zeroes_layer_grads",
    "test_seg_dataset.py::test_seg_train_step",
    "test_seg_dataset.py::test_seg_validator_runs",
    "test_aux.py::test_profile_layers",
    "test_converter.py::test_converted_checkpoint_detects_ships",
    "test_converter.py::test_autoshape_end_to_end",
    "test_loss.py::test_loss_matches_torch_oracle",
    "test_loss.py::test_loss_gradients_finite",
    "test_pruned.py::test_pruned_blocks_forward",
    "test_segmentation.py::test_seg_loss_gradients",
    "test_segmentation.py::test_seg_loss_finite_and_components",
    "test_nms.py::test_greedy_suppress_matches_oracle_random",
    "test_export.py::test_stablehlo_roundtrip",
    "test_export.py::test_multibackend_ckpt",
    "test_builder.py::test_param_counts_match_reference",
    "test_builder.py::test_yolov5s_baseline_param_count",
    "test_segmentation.py::test_seg_loss_no_targets",
    "test_loss.py::test_loss_wiou_kind",
    "test_loss.py::test_loss_single_class_skips_cls",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(p in item.nodeid for p in SLOW_NODES):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
    assert jax.device_count() == 8
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
