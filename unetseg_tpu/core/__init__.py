from unetseg_tpu.core.config import Config  # noqa: F401
from unetseg_tpu.core.mesh import MeshSpec, make_mesh  # noqa: F401
