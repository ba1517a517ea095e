"""Per-block activation rematerialization (reference: torchok swin.py:77-80
wraps blocks in torch.utils.checkpoint behind `grad_checkpointing`; here the
same flag wraps blocks in nn.remat).

Tiny hand-sized instances keep the grad computations cheap on the 1-CPU CI
box; the flag itself is the same field every registered variant accepts via
backbone_params."""
import jax
import jax.numpy as jnp
import pytest

from torchok_tpu.constructor import BACKBONES
from torchok_tpu.models.backbones.beit import Beit
from torchok_tpu.models.backbones.davit import DaViT
from torchok_tpu.models.backbones.gcvit import GlobalContextVit
from torchok_tpu.models.backbones.swin import SwinTransformerV2
from torchok_tpu.models.backbones.vit import VisionTransformer

TINY = [
    (SwinTransformerV2, dict(img_size=32, patch_size=4, window_size=4,
                             embed_dim=16, depths=(1, 1), num_heads=(2, 2)), 32),
    (VisionTransformer, dict(img_size=32, patch_size=8, embed_dim=16,
                             depth=2, num_heads=2), 32),
    (Beit, dict(img_size=32, patch_size=8, embed_dim=16, depth=2,
                num_heads=2), 32),
    (DaViT, dict(embed_dims=(16, 32), num_heads=(2, 2), depths=(1, 1),
                 window_size=4), 32),
    (GlobalContextVit, dict(embed_dim=16, depths=(1, 1), num_heads=(2, 2),
                            window_size=(4, 4)), 32),
]


@pytest.mark.parametrize("cls,kw,hw", TINY,
                         ids=[c.__name__ for c, _, _ in TINY])
def test_remat_matches_plain_forward_and_grad(cls, kw, hw):
    plain = cls(**kw)
    remat = cls(grad_checkpointing=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, 3)) * 0.1
    variables = plain.init(jax.random.PRNGKey(0), x, False)

    # remat only changes the autodiff schedule, never numerics
    out_p = plain.apply(variables, x, False)
    out_r = remat.apply(variables, x, False)
    assert jnp.allclose(out_p, out_r, atol=1e-6), cls.__name__

    def loss(params, model):
        return jnp.sum(model.apply({**variables, "params": params}, x, False) ** 2)

    g_p = jax.grad(loss)(variables["params"], plain)
    g_r = jax.grad(loss)(variables["params"], remat)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_r)):
        assert jnp.allclose(a, b, atol=1e-4), cls.__name__


def test_registered_variant_accepts_flag():
    """YAML surface: backbone_params: {grad_checkpointing: true} reaches the
    registered entrypoints."""
    model = BACKBONES.get("vit_tiny_patch16_224")(grad_checkpointing=True)
    assert model.grad_checkpointing is True


def test_remat_appears_in_jaxpr():
    model = VisionTransformer(img_size=32, patch_size=8, embed_dim=16,
                              depth=2, num_heads=2, grad_checkpointing=True)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)

    def loss(params):
        return jnp.sum(model.apply({**variables, "params": params}, x, False))

    jaxpr = jax.make_jaxpr(jax.grad(loss))(variables["params"])
    assert any("remat" in str(e.primitive) for e in jaxpr.jaxpr.eqns), \
        "grad_checkpointing=True produced no remat regions"
