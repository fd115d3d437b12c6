from .t2i import t2i_generate, t2i_generate_ar  # noqa: F401
from .decode import mmu_generate, generate_text  # noqa: F401
