"""panogrf_tpu — TPU-native generalizable spherical radiance fields.

See README.md for the framework layout. Public convenience imports below;
submodules import lazily to keep `import panogrf_tpu` light.
"""

__version__ = "0.1.0"

__all__ = [
    "NeuralRayGenRenderer", "NeuralRayFtRenderer", "UniFuse", "Equi",
    "MVSDepthModel", "DepthStack", "SphereConvention", "get_convention",
    "load_config",
]


def __getattr__(name):
    if name in ("NeuralRayGenRenderer",):
        from panogrf_tpu.renderer.renderer import NeuralRayGenRenderer
        return NeuralRayGenRenderer
    if name in ("NeuralRayFtRenderer",):
        from panogrf_tpu.renderer.ft_renderer import NeuralRayFtRenderer
        return NeuralRayFtRenderer
    if name in ("UniFuse", "Equi"):
        from panogrf_tpu.models import unifuse
        return getattr(unifuse, name)
    if name == "MVSDepthModel":
        from panogrf_tpu.models.mvs import MVSDepthModel
        return MVSDepthModel
    if name == "DepthStack":
        from panogrf_tpu.models.depth_stack import DepthStack
        return DepthStack
    if name in ("SphereConvention", "get_convention"):
        from panogrf_tpu.core import sphere
        return getattr(sphere, name)
    if name == "load_config":
        from panogrf_tpu.config import load_config
        return load_config
    raise AttributeError(name)
