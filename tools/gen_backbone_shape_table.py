"""Regenerate tests/data/backbone_shapes.json — the cached eval_shape sweep.

The full 319-variant abstract trace costs ~12-20 min of CPU; committing its
result keyed by a hash of the model sources lets the default test run verify
every variant against the table in seconds, re-tracing only when model code
actually changes. Run me after touching torchok_tpu/models/ or ops/:

    python tools/gen_backbone_shape_table.py
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import torchok_tpu  # noqa: F401, E402
from torchok_tpu.constructor import BACKBONES  # noqa: E402
from torchok_tpu.utils.source_hash import model_source_hash  # noqa: E402


def trace_one(name: str):
    model = BACKBONES.get(name)()
    hw = int(getattr(model, "img_size", 64))
    x = jax.ShapeDtypeStruct((1, hw, hw, 3), jnp.float32)

    def init_and_features(rng, xx):
        variables = model.init(rng, xx, False)
        return model.apply(variables, xx, False,
                           method=model.forward_features)

    feats = jax.eval_shape(init_and_features, jax.random.PRNGKey(0), x)
    return {"hw": hw, "shapes": [list(f.shape) for f in feats]}


def main():
    names = sorted(BACKBONES.list_models())
    entries = {}
    for i, name in enumerate(names):
        entries[name] = trace_one(name)
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{len(names)} traced", flush=True)
    out = {"source_hash": model_source_hash(), "entries": entries}
    path = pathlib.Path(__file__).resolve().parent.parent / "tests" / "data" \
        / "backbone_shapes.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=0, sort_keys=True))
    print(f"wrote {path} ({len(entries)} entries, hash {out['source_hash'][:12]})")


if __name__ == "__main__":
    main()
