from mmfn_tpu.mapping.rough_map import (  # noqa: F401
    RoughMap, build_rmap, vectorize_xodr, write_rmap)
