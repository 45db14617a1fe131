"""Parameter-visualizer battery (reference visualize_parameters.py parity)."""

import os

import numpy as np
import pytest

from protein_ensemble_vae_tpu.viz.parameters import (
    parameter_stats,
    plot_bias_distributions,
    plot_layer_statistics,
    plot_parameter_magnitudes,
    plot_weight_distributions,
    plot_weight_heatmaps,
    visualize_parameters,
    write_parameter_summary,
)

pytest.importorskip("matplotlib")


@pytest.fixture(scope="module")
def params():
    rng = np.random.default_rng(0)
    return {
        "encoder": {
            "seq_proj": {"kernel": rng.normal(0, 0.02, (640, 256)).astype(np.float32),
                         "bias": np.zeros(256, np.float32)},
            "norm": {"scale": np.ones(256, np.float32),
                     "bias": np.zeros(256, np.float32)},
            "attn": {"query": {"kernel": rng.normal(0, 0.02, (256, 4, 64)).astype(np.float32)}},
        },
        "decoder": {
            "phi_e": {"kernel": rng.normal(0, 0.1, (128, 128)).astype(np.float32),
                      "bias": rng.normal(0, 0.01, 128).astype(np.float32)},
        },
    }


def test_parameter_stats_rows(params):
    rows = parameter_stats(params)
    names = {r["name"] for r in rows}
    assert "encoder/seq_proj/kernel" in names
    assert "decoder/phi_e/bias" in names
    total = sum(r["count"] for r in rows)
    assert total == 640 * 256 + 256 + 256 + 256 + 256 * 4 * 64 + 128 * 128 + 128
    for r in rows:
        assert np.isfinite([r["mean"], r["std"], r["min"], r["max"]]).all()


def test_summary_file(params, tmp_path):
    path = write_parameter_summary(params, str(tmp_path / "summary.txt"),
                                   epoch=7)
    text = open(path).read()
    assert "MODEL PARAMETER SUMMARY" in text
    assert "Checkpoint epoch: 7" in text
    assert "Parameters by module" in text
    assert "encoder" in text and "decoder" in text
    # detailed per-tensor section, sorted by size: largest tensor first
    assert text.index("encoder/seq_proj/kernel") < text.index("decoder/phi_e/bias")


def test_full_battery_produces_all_artifacts(params, tmp_path):
    artifacts = visualize_parameters(params, str(tmp_path / "viz"), epoch=3)
    assert set(artifacts) == {
        "weight_distributions", "bias_distributions", "weight_heatmaps",
        "layer_statistics", "parameter_magnitudes", "parameter_summary"}
    for kind, path in artifacts.items():
        assert path is not None, kind
        assert os.path.exists(path), kind
        assert os.path.getsize(path) > 0, kind


def test_individual_plots(params, tmp_path):
    assert plot_weight_distributions(params, str(tmp_path / "w.png"))
    assert plot_bias_distributions(params, str(tmp_path / "b.png"))
    assert plot_weight_heatmaps(params, str(tmp_path / "h.png"))
    assert plot_layer_statistics(params, str(tmp_path / "l.png"))
    assert plot_parameter_magnitudes(params, str(tmp_path / "m.png"))


def test_heatmaps_none_without_2d_weights(tmp_path):
    only_bias = {"m": {"bias": np.zeros(4, np.float32)}}
    assert plot_weight_heatmaps(only_bias, str(tmp_path / "h.png")) is None
