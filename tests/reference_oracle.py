"""Import the reference torch DA3 implementation as a numerical test oracle.

The reference snapshot at /root/reference is used read-only, at test time
only, to generate golden activations for parity checks of the JAX
re-implementation. Missing third-party deps (omegaconf, addict, xformers)
are shimmed with minimal stand-ins sufficient for model construction.
"""

import sys
import types

REFERENCE_BACKBONE = "/root/reference/projects/mmdet3d_plugin/models/backbone"


def _install_shims():
    if "addict" not in sys.modules:
        addict = types.ModuleType("addict")

        class ADict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

            def __delattr__(self, k):
                del self[k]

        addict.Dict = ADict
        sys.modules["addict"] = addict

    if "omegaconf" not in sys.modules:
        omegaconf = types.ModuleType("omegaconf")

        class DictConfig(dict):
            pass

        class ListConfig(list):
            pass

        class OmegaConf:
            _resolvers = {}

            @staticmethod
            def create(x=None):
                return DictConfig(x or {})

            @staticmethod
            def register_new_resolver(name, fn, **kw):
                OmegaConf._resolvers[name] = fn

            @staticmethod
            def to_container(x, **kw):
                return dict(x)

            @staticmethod
            def merge(*xs):
                out = {}
                for x in xs:
                    out.update(x)
                return DictConfig(out)

            @staticmethod
            def load(path):
                import yaml

                with open(path) as f:
                    return DictConfig(yaml.safe_load(f))

        omegaconf.DictConfig = DictConfig
        omegaconf.ListConfig = ListConfig
        omegaconf.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = omegaconf


def import_reference_da3():
    """Returns the reference depth_anything_3 package (or None if broken)."""
    _install_shims()
    if REFERENCE_BACKBONE not in sys.path:
        sys.path.insert(0, REFERENCE_BACKBONE)
    import depth_anything_3  # noqa

    return depth_anything_3
