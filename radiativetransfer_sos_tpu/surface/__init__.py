from .fresnel import fresnel_expansion, fresnel_elements  # noqa: F401
from .glitter import glitter_matrices, gsf_fourier  # noqa: F401
from .compose import reflection_matrices  # noqa: F401
