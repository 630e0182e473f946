from .fresnel import fresnel_expansion, fresnel_elements  # noqa: F401
from .glitter import glitter_matrices, gsf_fourier, fourier_dyadic  # noqa: F401
from .compose import reflection_matrices  # noqa: F401
from .brdf import (roujean_fourier, roujean_matrices, roujean_f,  # noqa: F401
                   rondeaux_fourier, breon_fourier, nadal_fourier,
                   maignan_fourier, bpdf_matrices)
