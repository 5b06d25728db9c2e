from mmfn_tpu.data.batch import Batch  # noqa: F401
from mmfn_tpu.data.synthetic import synthetic_batch  # noqa: F401
