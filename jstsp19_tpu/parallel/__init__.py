from jstsp19_tpu.parallel.mesh import make_mesh, mesh_shape_for  # noqa: F401
from jstsp19_tpu.parallel.sharded_admm import sharded_admm_step  # noqa: F401
