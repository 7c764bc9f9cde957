from macroc_tpu.constitutive.base import HomogenizeResult, ConstitutiveEngine
from macroc_tpu.constitutive.elastic import ElasticEngine, elastic_matrix
from macroc_tpu.constitutive.j2 import J2Engine


def make_engine(cfg, dtype):
    """Engine factory from MacroConfig (reference ctor: micropp_C_create3 at
    src/init.c:210-213 with materials from micropp_C_material_set)."""
    kind = cfg.constitutive
    if kind == "elastic":
        return ElasticEngine(cfg.micro_mat_1, dtype=dtype)
    if kind == "j2":
        return J2Engine(cfg.micro_mat_1, dtype=dtype)
    if kind == "microfe":
        from macroc_tpu.constitutive.microfe import MicroFEEngine

        return MicroFEEngine(
            n=cfg.micro_n,
            micro_type=cfg.micro_type,
            mat1=cfg.micro_mat_1,
            mat2=cfg.micro_mat_2,
            params=cfg.micro_params,
            dtype=dtype,
        )
    raise ValueError(f"unknown constitutive engine '{kind}'")


__all__ = [
    "HomogenizeResult",
    "ConstitutiveEngine",
    "ElasticEngine",
    "J2Engine",
    "elastic_matrix",
    "make_engine",
]
