from macroc_tpu.io.info import InfoWriter, GaussEvolutionWriter
from macroc_tpu.io.vtu import write_pvtu

__all__ = ["InfoWriter", "GaussEvolutionWriter", "write_pvtu"]
