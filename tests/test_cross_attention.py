"""Cross-attention warp pipeline (C26) with a fake capture function."""

import numpy as np
import pytest

from attwarp_tpu.warp.cross_attention import (
    aggregate_attention_map_for_tokens,
    compute_token_importance,
    run_cross_attention_warp,
)


def _fake_maps(rng, steps=(200, 600, 1000), layers=(0, 1), hw=(8, 8), tokens=6):
    return {
        t: {
            l: rng.random((1, 2, hw[0], hw[1], tokens)).astype(np.float32)
            for l in layers
        }
        for t in steps
    }


def test_token_importance(rng):
    maps = _fake_maps(rng)
    s = compute_token_importance(maps)
    assert s.shape == (6,)
    # mean over all 6 (step, layer) score vectors
    manual = np.mean(
        [maps[t][l].sum(axis=(0, 1, 2, 3)) for t in maps for l in sorted(maps[t])],
        axis=0,
    )
    np.testing.assert_allclose(s, manual, rtol=1e-6)
    # last_timestep selects max step + max layer only
    s_last = compute_token_importance(maps, last_timestep=True)
    np.testing.assert_allclose(s_last, maps[1000][1].sum(axis=(0, 1, 2, 3)), rtol=1e-6)
    # num_layers=1 keeps only the last layer per step
    s1 = compute_token_importance(maps, num_layers=1)
    manual1 = np.mean([maps[t][1].sum(axis=(0, 1, 2, 3)) for t in maps], axis=0)
    np.testing.assert_allclose(s1, manual1, rtol=1e-6)


def test_aggregate_top_tokens(rng):
    maps = _fake_maps(rng)
    out = aggregate_attention_map_for_tokens(maps, [0, 3], num_last_layers=1)
    assert out.shape == (8, 8)
    assert abs(out.min()) < 1e-7 and abs(out.max() - 1.0) < 1e-6
    with pytest.raises(ValueError):
        aggregate_attention_map_for_tokens(maps, [0], inference_step_selection=[])


def test_full_pipeline_with_fake_capture(rng):
    img = (rng.random((40, 50, 3)) * 255).astype(np.float32)

    def capture(image, prompt):
        assert prompt == "what is this?"
        return _fake_maps(rng)

    outs, att = run_cross_attention_warp(
        img, "what is this?", capture, top_k=3, iterations=2, width=50, height=40,
    )
    assert len(outs) == 2
    assert np.asarray(outs[-1]).shape == (40, 50, 3)
    assert att.shape == (40, 50)
    assert np.isfinite(np.asarray(outs[-1])).all()
