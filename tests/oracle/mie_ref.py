"""Independent Mie reference (Bohren & Huffman downward-Dn algorithm).

Test oracle ONLY.  Complex-arithmetic formulation, deliberately different
from the real-arithmetic Gn/Cn/Sn scheme of the reference Fortran
(``src/SOS_MIE.F``) and of the JAX port — agreement between the two is
strong evidence of correctness.
"""

import numpy as np


def mie_coefficients(x, m):
    """(a_n, b_n) for size parameter x, complex index m (Im(m) <= 0).

    Uses the absorbing-medium convention of the reference (IN < 0); the
    resulting a_n, b_n follow the B&H convention with exp(-iwt).
    """
    m = complex(m.real, abs(m.imag))       # B&H uses positive imaginary part
    nmax = int(x + 4.05 * x ** (1.0 / 3.0) + 2) + 10
    nmx = int(max(nmax, abs(m * x).real) + 16)
    # downward recurrence for D_n(mx)
    d = np.zeros(nmx + 1, dtype=complex)
    mx = m * x
    for n in range(nmx, 0, -1):
        d[n - 1] = n / mx - 1.0 / (d[n] + n / mx)

    psi0 = np.cos(x)            # psi_{-1}
    psi1 = np.sin(x)            # psi_0
    chi0 = -np.sin(x)           # chi_{-1}
    chi1 = np.cos(x)            # chi_0
    xi1 = complex(psi1, -chi1)
    a = np.zeros(nmax + 1, dtype=complex)
    b = np.zeros(nmax + 1, dtype=complex)
    for n in range(1, nmax + 1):
        psi = (2 * n - 1.0) / x * psi1 - psi0
        chi = (2 * n - 1.0) / x * chi1 - chi0
        xi = complex(psi, -chi)
        ta = d[n] / m + n / x
        tb = d[n] * m + n / x
        a[n] = (ta * psi - psi1) / (ta * xi - xi1)
        b[n] = (tb * psi - psi1) / (tb * xi - xi1)
        psi0, psi1 = psi1, psi
        chi0, chi1 = chi1, chi
        xi1 = xi
    return a[1:], b[1:]


def mie_quantities(x, m, mu):
    """(qext, qsca, g, i_ph, q_ph, u_ph) on direction cosines mu.

    Phase functions follow the reference normalization: the output of
    ``SOS_FPHASE_MIE`` (``src/SOS_MIE.F:896-905``) equals
    2/(Qsca x^2) * (|S1|^2 + |S2|^2) etc.  The reference evaluates the
    angular polynomials at -mu but its An/Bn carry an alternating (-1)^n
    factor (``UN``, ``src/SOS_MIE.F:535-585``) whose parity flips the
    argument back: the net convention is the standard phase function at
    cos(Theta) = +mu.
    """
    a, b = mie_coefficients(x, m)
    n = np.arange(1, a.size + 1)
    qext = 2.0 / x ** 2 * np.sum((2 * n + 1) * (a + b).real)
    qsca = 2.0 / x ** 2 * np.sum((2 * n + 1) * (np.abs(a) ** 2 + np.abs(b) ** 2))
    gsum = 0.0
    for k in range(1, a.size):
        gsum += (k * (k + 2.0) / (k + 1.0)
                 * (a[k - 1] * np.conj(a[k]) + b[k - 1] * np.conj(b[k])).real)
    gsum += np.sum((2 * n + 1.0) / (n * (n + 1.0)) * (a * np.conj(b)).real)
    g = 4.0 / (qsca * x ** 2) * gsum

    cth = np.asarray(mu)
    s1 = np.zeros(cth.shape, dtype=complex)
    s2 = np.zeros(cth.shape, dtype=complex)
    pim = np.zeros_like(cth)
    piv = np.ones_like(cth)
    for k in range(1, a.size + 1):
        tau = k * cth * piv - (k + 1.0) * pim
        f = (2 * k + 1.0) / (k * (k + 1.0))
        s1 += f * (a[k - 1] * piv + b[k - 1] * tau)
        s2 += f * (a[k - 1] * tau + b[k - 1] * piv)
        pip = ((2.0 * k + 1.0) * cth * piv - (k + 1.0) * pim) / k
        pim = piv
        piv = pip
    coef = 2.0 / (qsca * x ** 2)
    i_ph = coef * (np.abs(s1) ** 2 + np.abs(s2) ** 2)
    q_ph = coef * (np.abs(s2) ** 2 - np.abs(s1) ** 2)
    u_ph = coef * 2.0 * (s1 * np.conj(s2)).real
    return qext, qsca, g, i_ph, q_ph, u_ph
