"""Generate the example ComfyUI workflow graph for the K5-TPU nodes.

The reference ships a ready-to-load graph
(/root/reference/comfyui/kandisnky5_lite_T2V.json) wiring its node set
into a text-to-video pipeline; this emits the equivalent graph for
kandinsky5_tpu.comfyui_nodes, built programmatically from each node's
INPUT_TYPES so widget order and link types can never drift from the
node definitions (tests/test_components.py validates the emitted file
against NODE_CLASS_MAPPINGS).

    python tools/make_comfyui_workflow.py [out.json]
"""

from __future__ import annotations

import json
import sys

from kandinsky5_tpu.comfyui_nodes import NODE_CLASS_MAPPINGS

# link-typed inputs (everything else is a widget)
LINK_TYPES = {"K5_TEXT_EMBEDDER", "K5_DIT", "K5_VAE", "K5_COND", "K5_LATENT",
              "MODEL", "LATENT", "IMAGE"}


def _inputs(cls):
    return list(cls.INPUT_TYPES()["required"].items())


def build_workflow():
    nodes, links = [], []
    outputs_by_node = {}  # node id -> {return type: slot}
    next_id, next_link = iter(range(1, 100)), iter(range(1, 100))

    def add(type_name, widget_overrides=None, wire=()):
        """wire: [(input_name, src_node_id, src_slot)]"""
        cls = NODE_CLASS_MAPPINGS.get(type_name)
        nid = next(next_id)
        ins, widgets = [], []
        if cls is not None:
            for name, (ty, *opts) in _inputs(cls):
                if isinstance(ty, list):  # combo widget
                    widgets.append((widget_overrides or {}).get(name, ty[0]))
                elif ty in LINK_TYPES:
                    src = dict((w[0], w[1:]) for w in wire).get(name)
                    lid = None
                    if src is not None:
                        lid = next(next_link)
                        links.append([lid, src[0], src[1], nid,
                                      len(ins), ty])
                    ins.append({"name": name, "type": ty, "link": lid})
                else:
                    dflt = (opts[0] if opts else {}).get("default", "")
                    widgets.append((widget_overrides or {}).get(name, dflt))
            outs = [{"name": t, "type": t, "links": [], "slot_index": i}
                    for i, t in enumerate(cls.RETURN_TYPES)]
        else:  # comfy-core node (SaveAnimatedWEBP)
            for name, src_nid, src_slot in wire:
                lid = next(next_link)
                links.append([lid, src_nid, src_slot, nid, len(ins), "IMAGE"])
                ins.append({"name": name, "type": "IMAGE", "link": lid})
            widgets = list((widget_overrides or {}).values())
            outs = []
        nodes.append({
            "id": nid, "type": type_name, "pos": [220 * nid, 80 * (nid % 4)],
            "size": [320, 40 + 22 * (len(ins) + len(widgets))],
            "flags": {}, "order": nid - 1, "mode": 0,
            "inputs": ins, "outputs": outs,
            "properties": {"Node name for S&R": type_name},
            "widgets_values": widgets,
        })
        outputs_by_node[nid] = nodes[-1]
        return nid

    emb = add("Kandinsky5LoadTextEmbedders")
    dit = add("Kandinsky5LoadDiT")
    vae = add("Kandinsky5LoadVAE")
    expand = add("Kandinsky5PromptExpand",
                 {"prompt": "A dog in red hat"},
                 wire=[("text_embedder", emb, 0)])
    cond = add("Kandinsky5TextEncode",
               {"prompt": "A dog in red hat"},
               wire=[("text_embedder", emb, 0)])
    neg = add("Kandinsky5TextEncode",
              {"prompt": "Static, 2D cartoon, cartoon, 2d animation, "
                         "paintings, images, worst quality, low quality, "
                         "ugly, deformed, walking backwards"},
              wire=[("text_embedder", emb, 0)])
    gen = add("Kandinsky5Generate",
              wire=[("dit", dit, 0), ("cond", cond, 0),
                    ("negative_cond", neg, 0)])
    dec = add("Kandinsky5VAEDecode",
              wire=[("vae", vae, 0), ("latent", gen, 0)])
    add("SaveAnimatedWEBP",
        {"filename_prefix": "kandinsky5_tpu", "fps": 24, "lossless": False,
         "quality": 90, "method": "default"},
        wire=[("images", dec, 0)])
    _ = expand  # standalone branch, mirrors the reference graph

    # backfill output link lists
    for lid, src, slot, dst, dslot, ty in links:
        outputs_by_node[src]["outputs"][slot]["links"].append(lid)

    return {
        "id": "kandinsky5-tpu-t2v",
        "revision": 0,
        "last_node_id": max(n["id"] for n in nodes),
        "last_link_id": max(l[0] for l in links),
        "nodes": nodes,
        "links": links,
        "groups": [],
        "config": {},
        "extra": {},
        "version": 0.4,
    }


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "examples/comfyui_workflow_t2v.json"
    with open(out, "w") as f:
        json.dump(build_workflow(), f, indent=2)
    print("wrote", out)
