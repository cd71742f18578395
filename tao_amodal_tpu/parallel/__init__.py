"""Scale-out: device meshes, data-parallel training, context-parallel
evaluation, host pools.

The TPU-native replacement for the reference's distributed layer
(NCCL ``pysot/utils/distributed.py``, ``nn.DataParallel``
``pytracking/ltr/admin/multigpu.py``, CPU pools
``tao/utils/parallel/``): everything rides ``jax.sharding.Mesh`` +
XLA collectives — parameter broadcast is replicated sharding, gradient
all-reduce is a ``psum`` XLA inserts for us, the DistributedSampler is
a sharded batch axis.
"""

from tao_amodal_tpu.parallel.mesh import make_mesh  # noqa: F401
from tao_amodal_tpu.parallel.dp import make_train_step  # noqa: F401
from tao_amodal_tpu.parallel.tp import (  # noqa: F401
    place_tp,
    tp_param_shardings,
)
from tao_amodal_tpu.parallel.cp import sharded_track_iou  # noqa: F401
from tao_amodal_tpu.parallel.pool import (  # noqa: F401
    FixedDevicePool,
    PoolWithContext,
)
