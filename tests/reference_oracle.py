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

    if "evo" not in sys.modules:
        # pose_align.py imports evo.core.trajectory.PosePath3D for type
        # annotations / trajectory containers; a stub suffices for model
        # construction and forward passes that never align trajectories
        evo = types.ModuleType("evo")
        core = types.ModuleType("evo.core")
        traj = types.ModuleType("evo.core.trajectory")

        class PosePath3D:  # pragma: no cover - never exercised
            def __init__(self, *a, **kw):
                raise RuntimeError("evo stub: trajectory ops unavailable")

        traj.PosePath3D = PosePath3D
        core.trajectory = traj
        evo.core = core
        sys.modules["evo"] = evo
        sys.modules["evo.core"] = core
        sys.modules["evo.core.trajectory"] = traj

    if "e3nn" not in sys.modules:
        # sh_helpers.py imports e3nn.o3 lazily for SH rotation; stub raises
        # if actually called (layout tests never rotate harmonics)
        e3nn = types.ModuleType("e3nn")
        o3 = types.ModuleType("e3nn.o3")

        def _unavailable(*a, **kw):  # pragma: no cover
            raise RuntimeError("e3nn stub: SH rotation unavailable")

        o3.matrix_to_angles = _unavailable
        o3.wigner_D = _unavailable
        e3nn.o3 = o3
        sys.modules["e3nn"] = e3nn
        sys.modules["e3nn.o3"] = o3


def import_reference_da3():
    """Returns the reference depth_anything_3 package (or None if broken)."""
    _install_shims()
    if REFERENCE_BACKBONE not in sys.path:
        sys.path.insert(0, REFERENCE_BACKBONE)
    import depth_anything_3  # noqa

    return depth_anything_3
