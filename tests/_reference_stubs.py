"""Import shims so the PUBLIC reference implementation at /root/reference can be
imported for side-by-side parity testing (VERDICT round 1, item 3) in this
container, which lacks torchvision/albumentations/webdataset/boto3/etc.

Only import-time surface is stubbed; every code path the parity tests execute
(FourM forward, VectorQuantize forward) uses torch/einops only, which are real.
"""

import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"


class _Dummy:
    """Permissive stand-in: constructible, callable, getattr-able."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return _Dummy()


class _StubModule(types.ModuleType):
    """Module whose unknown attributes resolve to permissive dummies, so
    import-time references like T.RandomApply(...) don't fail."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _Dummy()


def _mod(name, **attrs):
    m = _StubModule(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)
    return sys.modules[name]


def install_reference_stubs():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # --- torchvision ---------------------------------------------------
    tv = _mod("torchvision")
    transforms = _mod("torchvision.transforms",
                      InterpolationMode=types.SimpleNamespace(
                          BICUBIC="bicubic", BILINEAR="bilinear", NEAREST="nearest"))
    tf_functional = _mod("torchvision.transforms.functional")
    transforms.functional = tf_functional
    tv.transforms = transforms
    datasets = _mod("torchvision.datasets")

    class _VisionDataset:
        def __init__(self, root, *a, **k):
            self.root = root

    vision = _mod("torchvision.datasets.vision", VisionDataset=_VisionDataset)
    datasets.vision = vision
    tv.datasets = datasets
    ops = _mod("torchvision.ops")
    ops_misc = _mod("torchvision.ops.misc", FrozenBatchNorm2d=_Dummy)
    ops.misc = ops_misc
    tv.ops = ops

    # --- webdataset ----------------------------------------------------
    def _pipelinefilter(fn):
        def _curried(*args, **kw):
            def _stage(data):
                return fn(data, *args, **kw)
            return _stage
        return _curried

    def _reraise(exn):
        raise exn

    def _warn_and_continue(exn):
        return True

    wds = _mod("webdataset", tarfile_samples=lambda *a, **k: iter(()))
    filters = _mod("webdataset.filters", pipelinefilter=_pipelinefilter,
                   reraise_exception=_reraise)
    handlers = _mod("webdataset.handlers", warn_and_continue=_warn_and_continue,
                    reraise_exception=_reraise)
    wds.filters = filters
    wds.handlers = handlers

    # --- small leaf deps -------------------------------------------------
    _mod("braceexpand", braceexpand=lambda s: [s])
    _mod("albumentations")
    boto3 = _mod("boto3", client=lambda *a, **k: None)
    s3 = _mod("boto3.s3")
    transfer = _mod("boto3.s3.transfer", TransferConfig=_Dummy)
    s3.transfer = transfer
    boto3.s3 = s3


def _install_diffusers_stubs():
    """Minimal diffusers API surface for the forked reference schedulers
    (scheduling_pndm/ddpm/ddim.py): ConfigMixin + register_to_config that
    record ctor kwargs on .config, SchedulerMixin/BaseOutput shells."""
    import functools
    import inspect

    if "diffusers" in sys.modules:
        return

    class _FrozenDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    class ConfigMixin:
        pass

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *a, **k):
            sig = inspect.signature(init)
            bound = sig.bind(self, *a, **k)
            bound.apply_defaults()
            cfg = {n: v for n, v in bound.arguments.items() if n != "self"}
            self.config = _FrozenDict(cfg)
            return init(self, *a, **k)

        return wrapper

    class SchedulerMixin:
        pass

    class BaseOutput(dict):
        def __init__(self, **kw):
            super().__init__(**kw)
            for k, v in kw.items():
                setattr(self, k, v)

    class SchedulerOutput(BaseOutput):
        pass

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        import torch

        return torch.randn(*shape, generator=generator, dtype=dtype)

    diff = _mod("diffusers")
    cu = _mod("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
              register_to_config=register_to_config)
    du = _mod("diffusers.utils", BaseOutput=BaseOutput, randn_tensor=randn_tensor,
              deprecate=lambda *a, **k: None)
    su = _mod("diffusers.schedulers")
    ssu = _mod("diffusers.schedulers.scheduling_utils",
               SchedulerMixin=SchedulerMixin, SchedulerOutput=SchedulerOutput,
               KarrasDiffusionSchedulers=[])
    diff.configuration_utils = cu
    diff.utils = du
    su.scheduling_utils = ssu
    diff.schedulers = su


def import_reference_scheduler(name: str):
    """Load a forked reference scheduler module standalone (bypasses
    fourm.vq.__init__). name in {'pndm', 'ddpm', 'ddim'}."""
    install_reference_stubs()
    _install_diffusers_stubs()
    import importlib.util

    mod_name = f"_ref_scheduling_{name}"
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    # scheduling_utils fork is imported relatively by the scheduler forks? no —
    # they are standalone files importing diffusers only.
    spec = importlib.util.spec_from_file_location(
        mod_name, f"{REFERENCE_ROOT}/fourm/vq/scheduling/scheduling_{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod


def import_reference_fm():
    """Import the reference FourM module. Returns the fourm.models.fm module."""
    install_reference_stubs()
    import fourm.models.fm as ref_fm  # noqa: F401

    return ref_fm


def import_reference_quantizer():
    """Load the reference quantizer standalone (bypasses fourm.vq.__init__,
    which pulls in diffusers). quantize_lucid.py only needs torch/einops."""
    install_reference_stubs()
    import importlib.util

    name = "_ref_quantize_lucid"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_ROOT}/fourm/vq/quantizers/quantize_lucid.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
