"""Component-level tests: ComfyUI node layer, offload store, IO, CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_comfyui_nodes_importable_without_host():
    from kandinsky5_tpu.comfyui_nodes import (
        NODE_CLASS_MAPPINGS,
        NODE_DISPLAY_NAME_MAPPINGS,
    )

    assert len(NODE_CLASS_MAPPINGS) == 7  # reference node count
    for name, cls in NODE_CLASS_MAPPINGS.items():
        assert hasattr(cls, "INPUT_TYPES")
        assert hasattr(cls, "RETURN_TYPES")
        assert hasattr(cls, "FUNCTION")
        assert name in NODE_DISPLAY_NAME_MAPPINGS


def test_comfyui_workflow_json_consistent():
    """The shipped example workflow graph (examples/
    comfyui_workflow_t2v.json, the analog of the reference's
    comfyui/kandisnky5_lite_T2V.json) stays consistent with the node
    definitions: every K5 node type exists, every link lands on an
    input of the declared type, and widget counts match the non-link
    inputs of INPUT_TYPES."""
    import json

    from kandinsky5_tpu.comfyui_nodes import NODE_CLASS_MAPPINGS
    from tools.make_comfyui_workflow import LINK_TYPES, build_workflow

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "comfyui_workflow_t2v.json")
    with open(path) as f:
        wf = json.load(f)
    # the checked-in file is exactly what the generator emits
    assert wf == build_workflow()

    by_id = {n["id"]: n for n in wf["nodes"]}
    for node in wf["nodes"]:
        if node["type"] == "SaveAnimatedWEBP":  # comfy-core sink
            continue
        cls = NODE_CLASS_MAPPINGS[node["type"]]
        req = cls.INPUT_TYPES()["required"]
        link_ins = [n for n, (t, *_) in req.items()
                    if not isinstance(t, list) and t in LINK_TYPES]
        assert [i["name"] for i in node["inputs"]] == link_ins
        assert len(node["widgets_values"]) == len(req) - len(link_ins)
        assert [o["type"] for o in node["outputs"]] == list(cls.RETURN_TYPES)
    for lid, src, slot, dst, dslot, ty in wf["links"]:
        assert by_id[src]["outputs"][slot]["type"] == ty
        assert by_id[dst]["inputs"][dslot]["type"] == ty
        assert lid in by_id[src]["outputs"][slot]["links"]
        assert by_id[dst]["inputs"][dslot]["link"] == lid
    # the graph terminates in a video sink fed by the VAE decode
    sink = [n for n in wf["nodes"] if n["type"] == "SaveAnimatedWEBP"]
    assert len(sink) == 1 and sink[0]["inputs"][0]["link"] is not None


def test_comfyui_generate_node_tiny():
    """Drive the Generate node end-to-end with a tiny DiT."""
    from kandinsky5_tpu.comfyui_nodes import Kandinsky5Generate
    from kandinsky5_tpu.config import DiTParams
    from kandinsky5_tpu.models.dit import init_dit_params

    cfg = DiTParams(in_visual_dim=16, out_visual_dim=16, in_text_dim=32,
                    in_text_dim2=16, time_dim=32, model_dim=64, ff_dim=128,
                    num_text_blocks=1, num_visual_blocks=2,
                    axes_dims=(8, 4, 4), visual_cond=True)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    dit = {"params": params, "cfg": cfg, "attention_type": "flash"}
    rng = np.random.RandomState(0)
    cond = {"text_embeds": jnp.asarray(rng.randn(1, 5, 32), jnp.float32),
            "pooled_embed": jnp.asarray(rng.randn(1, 16), jnp.float32),
            "mask": jnp.ones((1, 5), bool)}
    (latent,) = Kandinsky5Generate().generate(
        dit, cond, cond, width=64, height=64, length=5, steps=2,
        guidance_weight=1.0, scheduler_scale=5.0, seed=1)
    assert latent.shape == (1, 2, 8, 8, 16)
    assert bool(jnp.all(jnp.isfinite(latent)))


def test_offload_store_round_trip():
    from kandinsky5_tpu.utils.offload import ParamStore, staged

    tree = {"a": jnp.ones((4, 4)), "b": {"c": jnp.arange(3.0)}}
    store = ParamStore(tree, offload=True)
    with staged(store) as params:
        assert isinstance(params["a"], jax.Array)
        np.testing.assert_array_equal(np.asarray(params["b"]["c"]),
                                      np.arange(3.0))
    assert store._device is None  # released after the stage

    direct = ParamStore(tree, offload=False)
    assert direct.params is tree


def test_native_video_writer(tmp_path):
    from kandinsky5_tpu.utils.native_video import (
        native_available,
        write_video_native,
    )

    if not native_available():
        pytest.skip("no native lib / compiler")
    frames = (np.random.RandomState(0).rand(4, 32, 48, 3) * 255).astype(np.uint8)
    out = str(tmp_path / "clip.y4m")
    assert write_video_native(out, frames, fps=24)
    data = open(out, "rb").read()
    assert data.startswith(b"YUV4MPEG2 W48 H32 F24:1")
    # 4 frames of 32*48*1.5 bytes + headers
    assert data.count(b"FRAME\n") == 4


def test_cli_help():
    res = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "cli.py"),
         "--help"], capture_output=True, text=True, timeout=120)
    assert res.returncode == 0
    for flag in ("--prompt", "--video_duration", "--magcache", "--offload",
                 "--scheduler_scale", "--expand_prompt"):
        assert flag in res.stdout


def test_magcache_pipeline_flag():
    """MagCache engages through the pipeline when the config carries
    calibrated ratios."""
    from kandinsky5_tpu.config import load_config
    from kandinsky5_tpu.sampling import magcache_schedule

    conf = load_config(os.path.join(os.path.dirname(__file__), "..",
                                    "kandinsky5_tpu", "configs",
                                    "config_5s_sft.yaml"))
    skip = magcache_schedule(conf.magcache, conf.model.num_steps, no_cfg=False)
    # warmup region (first 20% of 100 calls -> 10 steps) never skips
    assert not skip[:10].any()
    assert skip.sum() > 10  # calibrated table produces substantial skipping
