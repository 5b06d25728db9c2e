from mmfn_tpu.mapping.rough_map import RoughMap, build_rmap, write_rmap  # noqa: F401
