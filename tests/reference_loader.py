"""Import the PyTorch reference implementation (read-only, /root/reference)
for golden-parity testing. Missing optional deps are stubbed."""

import sys
import types

REF = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    import torch

    tv = _stub("torchvision")
    _stub("torchvision.ops")
    misc = _stub("torchvision.ops.misc", FrozenBatchNorm2d=torch.nn.Module)
    tv.ops = sys.modules["torchvision.ops"]
    sys.modules["torchvision.ops"].misc = misc

    class _Interp:
        BICUBIC = BILINEAR = NEAREST = None

    tfm = _stub(
        "torchvision.transforms",
        Normalize=object, Compose=object, InterpolationMode=_Interp,
        Resize=object, CenterCrop=object, ToTensor=object,
        RandomResizedCrop=object, RandomHorizontalFlip=object,
    )
    tfm.functional = _stub("torchvision.transforms.functional")
    tv.transforms = tfm

    _stub("ipdb", set_trace=lambda: None)

    def _trunc_normal(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std, max=b * std)
        return tensor

    timm = _stub("timm")
    timm.models = _stub("timm.models")
    timm.models.layers = _stub(
        "timm.models.layers",
        trunc_normal_=_trunc_normal,
        Mlp=torch.nn.Module,
        to_2tuple=lambda x: x if isinstance(x, tuple) else (x, x),
        DropPath=torch.nn.Identity,
    )
    sys.modules["timm"].models.layers = sys.modules["timm.models.layers"]

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    _stub("easydict", EasyDict=EasyDict)


def _package_shell(name, path):
    """Register an empty package whose submodules resolve under `path`,
    bypassing the real package __init__ (which drags in heavy deps)."""
    import importlib.machinery
    import importlib.util

    if name in sys.modules:
        return
    spec = importlib.machinery.ModuleSpec(name, None, is_package=True)
    mod = importlib.util.module_from_spec(spec)
    mod.__path__ = [path]
    sys.modules[name] = mod


def load_eva_vit_module():
    install_stubs()
    import importlib

    _package_shell("refclip", f"{REF}/model/evaclip")
    return importlib.import_module("refclip.eva_vit_model")


def _patch_transformers():
    """The reference bert.py targets transformers 4.26; newer releases moved
    a few helpers. Re-export them where the reference expects them."""
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for name in (
        "apply_chunking_to_forward",
        "find_pruneable_heads_and_indices",
        "prune_linear_layer",
    ):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))


def load_mico_module():
    """Import the full reference MiCo (model/mico.py). Constructing a model
    must happen with cwd=/root/reference (relative BertConfig/tokenizer
    paths, model/mico.py:102,109)."""
    install_stubs()
    _patch_transformers()
    import importlib

    if REF not in sys.path:
        sys.path.insert(0, REF)
    return importlib.import_module("model.mico")


def load_bert_module():
    install_stubs()
    _patch_transformers()
    import importlib.util

    name = "ref_bert"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, f"{REF}/model/bert.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_beats_module():
    """Import the reference BEATs (torchaudio stubbed — only its kaldi fbank
    helper is referenced, in a code path the tests never call)."""
    install_stubs()
    ta = _stub("torchaudio")
    comp = _stub("torchaudio.compliance")
    kaldi = _stub("torchaudio.compliance.kaldi", fbank=None)
    ta.compliance = comp
    comp.kaldi = kaldi
    import importlib.util

    name = "ref_beats"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, f"{REF}/data/model/audio_encoders/beats/beats.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ast_module():
    install_stubs()
    import importlib.util

    name = "ref_ast"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, f"{REF}/data/model/audio_encoders/ast/ast.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
