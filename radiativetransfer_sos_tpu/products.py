"""Stage-product file writers for mechanical diffing against the reference.

The reference pipeline communicates through product files; the TPU
framework keeps everything in memory but can emit the same products on
request so that stage-level diffing against a compiled reference (or
archived runs) stays mechanical:

* angle tables (``SOS_UsedAngles.txt`` layout, ``src/SOS_ANGLES.F:168-194``
  and formats ``:634-648``) — ``-ANG.Rad.ResFile`` / ``-ANG.Aer.ResFile``;
* aerosol expansion (``Aerosols.txt``, formats
  ``src/SOS_AEROSOLS.F:3048-3053`` written at ``:2868-2890``) —
  ``-AER.ResFile``;
* the binary Fourier-record product (``SOS_Result.bin``: one Fortran
  unformatted record per Fourier order IS holding
  ``(Q(-N..N), U(-N..N), I(-N..N))``, ``src/SOS_OS.F:1571-1575``) —
  ``-SOS.ResBin``;
* user-angle-filtered radiance files (rows with ``IND_ANGOUT == 1`` only,
  ``src/SOS_ABS_MAIN.F:2338-2366``) — ``-SOS.ResFileUp.UserAng`` /
  ``-SOS.ResFileDown.UserAng``.
"""

from __future__ import annotations

import struct

import numpy as np


def _d21(x: float) -> str:
    """Fortran D21.14 field (exponent letter D)."""
    s = "%21.14E" % x
    return s.replace("E", "D")


def write_angles_file(path: str, mu, w, kind: str, os_nb: int,
                      n_gauss: int, userfile: str = "NO_USER_ANGLES",
                      thetas_deg: float | None = None,
                      imus: int | None = None, os_ns: int | None = None,
                      os_nm: int | None = None,
                      is_user=None) -> None:
    """Angle product (``FICRES_MIE``/``FICRES_LUM``), formats
    ``src/SOS_ANGLES.F:634-648``."""
    mu = np.asarray(mu)
    w = np.asarray(w)
    with open(path, "w") as f:
        f.write("NB_TOTAL_ANGLES :%4d\n" % mu.shape[0])
        f.write("NB_GAUSS_ANGLES :%4d\n" % n_gauss)
        f.write("ANGLES_USERFILE :%s\n" % userfile)
        if kind == "LUM":
            f.write("SOLAR ZENITH ANGLE :%7.3f\n" % thetas_deg)
            f.write("INTERNAL_IMUS :%4d\n" % (imus + 1))
        f.write("INTERNAL_OS_NB :%4d\n" % os_nb)
        if kind == "LUM":
            f.write("INTERNAL_OS_NS :%4d\n" % os_ns)
            f.write("INTERNAL_OS_NM :%4d\n" % os_nm)
        f.write("INDEX   COS_ANGLE            WEIGHT\n")
        for j in range(mu.shape[0]):
            row = "%4d %s%s" % (j + 1, _d21(mu[j]), _d21(w[j]))
            if kind == "LUM":
                row += " %4d" % (int(is_user[j]) if is_user is not None
                                 else 0)
            f.write(row + "\n")


def write_aerosols_file(path: str, expansion, mean_ext=None,
                        mean_sca=None, asym=None) -> None:
    """``Aerosols.txt`` (written ``src/SOS_AEROSOLS.F:2868-2890``, formats
    ``:3048-3053``)."""
    e = expansion
    os_nb = len(np.asarray(e.beta)) - 1
    with open(path, "w") as f:
        f.write("---------------------------------\n")
        f.write("EXTINCTION CROSS SECTION (mic^2)     :%13.5E\n"
                % (mean_ext if mean_ext is not None else e.sigma_ext))
        f.write("SCATTERING CROSS SECTION (mic^2)     :%13.5E\n"
                % (mean_sca if mean_sca is not None else e.sigma_sca))
        f.write("ASYMMETRY FACTOR (no truncation)     :%13.5E\n"
                % (asym if asym is not None else 0.0))
        f.write("TRUNCATION COEFFICIENT               :%9.5f\n"
                % e.coef_tronca)
        f.write("SINGLE SCATTERING ALBEDO (truncation):%9.5f\n"
                % e.piz_tronc)
        f.write("---------------------------------\n")
        f.write("PHASE MATRIX COEFFICIENTS FOR K=0 TO%4d\n" % os_nb)
        f.write("ALPHA(K)        BETA11(K)       GAMMA12(K)      "
                "ZETA(K)\n")
        for k in range(os_nb + 1):
            f.write("%15.8E %15.8E %15.8E %15.8E\n"
                    % (e.alpha[k], e.beta[k], e.gamma[k], e.zeta[k]))


def write_fourier_bin(path: str, records_signed: np.ndarray) -> None:
    """Binary Fourier-record product (``src/SOS_OS.F:1571-1575``).

    ``records_signed``: (S, 3, D) aggregated Stokes records on the signed
    direction axis (Stokes order I, Q, U — ours), D = 2*NBMU+1.  One
    Fortran unformatted sequential record per order: 4-byte length marker,
    ``(Q, U, I)`` each over the full signed range, 4-byte marker.  Orders
    past the last non-zero record (the Fourier exit) are not written,
    matching the reference file which only holds computed orders.
    """
    recs = np.asarray(records_signed, dtype=np.float64)
    nz = np.nonzero(np.any(recs != 0.0, axis=(1, 2)))[0]
    n_write = (int(nz[-1]) + 1) if nz.size else 1
    with open(path, "wb") as f:
        for s in range(n_write):
            payload = np.concatenate(
                [recs[s, 1], recs[s, 2], recs[s, 0]]).tobytes()
            marker = struct.pack("<i", len(payload))
            f.write(marker + payload + marker)


def read_fourier_bin(path: str, d: int) -> np.ndarray:
    """Inverse of :func:`write_fourier_bin` -> (S, 3, D) in (I, Q, U)."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (ln,) = struct.unpack("<i", head)
            payload = np.frombuffer(f.read(ln), dtype=np.float64)
            f.read(4)
            q, u, i = payload.reshape(3, d)
            out.append(np.stack([i, q, u]))
    return np.stack(out)


def write_user_angle_radiance_file(path: str, res, updown: int,
                                   itrphi: int, zalt) -> None:
    """User-angle-filtered ``SOS_Up/Down`` variant
    (``-SOS.ResFileUp.UserAng``, rows with ``IND_ANGOUT == 1`` only,
    ``src/SOS_ABS_MAIN.F:2338-2366``)."""
    from .api import _radiance_header

    tabs = res.up if updown == 1 else res.down
    theta = res.theta
    keep = np.asarray(res.grid.is_user, dtype=bool)
    with open(path, "w") as f:
        f.write(_radiance_header(itrphi, updown, zalt))
        if itrphi == 1:
            n = theta.shape[0]
            for row, sgn, order in ((0, -1.0, range(n - 1, -1, -1)),
                                    (1, 1.0, range(n))):
                for j in order:
                    if not keep[j]:
                        continue
                    f.write("  %7.2f %7.2f  %13.6e  %13.6e  %13.6e  "
                            "%7.2f %7.2f %13.6e\n"
                            % (sgn * theta[j], tabs["sca"][row, j],
                               tabs["i"][row, j], tabs["q"][row, j],
                               tabs["u"][row, j], tabs["pol_ang"][row, j],
                               tabs["pol_rate"][row, j],
                               tabs["l_pol"][row, j]))
        else:
            for ip, phid in enumerate(res.phi):
                for j in range(theta.shape[0]):
                    if not keep[j]:
                        continue
                    f.write(" %7.2f %7.2f %7.2f  %13.6e  %13.6e  %13.6e  "
                            "%7.2f %7.2f %13.6e\n"
                            % (phid, theta[j], tabs["sca"][ip, j],
                               tabs["i"][ip, j], tabs["q"][ip, j],
                               tabs["u"][ip, j], tabs["pol_ang"][ip, j],
                               tabs["pol_rate"][ip, j],
                               tabs["l_pol"][ip, j]))
