"""Golden parity for ModifiedResNet vs the reference
(model/evaclip/modified_resnet.py)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_loader import REF, _package_shell, install_stubs

from mico_tpu.models.modified_resnet import (
    ModifiedResNetConfig,
    init_modified_resnet,
    modified_resnet_forward,
    modified_resnet_from_torch,
)

CFG = ModifiedResNetConfig(
    layers=(1, 1, 1, 1), output_dim=24, heads=4, image_size=64, width=16
)


@pytest.fixture(scope="module")
def ref_model():
    install_stubs()
    _package_shell("refclip", f"{REF}/model/evaclip")
    mrn = importlib.import_module("refclip.modified_resnet")
    model = mrn.ModifiedResNet(
        layers=list(CFG.layers), output_dim=CFG.output_dim, heads=CFG.heads,
        image_size=CFG.image_size, width=CFG.width,
    )
    model.eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return model


def test_modified_resnet_golden(ref_model):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x)).numpy()
    params = modified_resnet_from_torch(ref_model.state_dict(), CFG)
    got = np.asarray(modified_resnet_forward(params, CFG, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_modified_resnet_init_shapes():
    params = init_modified_resnet(jax.random.PRNGKey(0), CFG)
    x = jnp.zeros((1, 3, 64, 64), jnp.float32)
    out = modified_resnet_forward(params, CFG, x)
    assert out.shape == (1, 24)
