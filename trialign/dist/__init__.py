from trialign.dist.mesh import make_mesh, default_mesh  # noqa: F401
from trialign.dist.batch import align_batch_padded, align_batch_sharded  # noqa: F401
