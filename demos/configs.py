"""The shipped end-to-end demo cases as keyword dictionaries.

Mirrors the reference demo scripts keyword-for-keyword:

* ``principal`` / ``polar`` — ``exe/runSOS-ABS_demo.ksh:82-90`` and
  ``exe/runSOS-ABS_demoPolar.ksh:82-90``: WMO maritime aerosol AOT 0.3 at
  550 nm, exponential profiles HR=8 / HA=2 km, tropical absorption profile
  at 10 cm^-1 CKD (fine mode), Cox-Munk glitter (wind 2 m/s, n=1.34,
  albedo 0), solar zenith 35 deg, 40 Gauss angles.

  **Wavelength note**: the shipped scripts run at 910 nm, whose H2O CKD
  table (``coef_H2O_11000_10500_10cmm1``) is absent from this data
  snapshot (``/root/reference/.MISSING_LARGE_BLOBS``) — the reference
  itself would abort there (``src/SOS_SUB_TRS.F:706-707``), and so does
  this framework (``tests/test_absorption.py::
  test_load_ckd_missing_gas_raises``).  The committed golden cases
  therefore pin the nearest fully-covered absorption window: 765 nm (O2
  A-band, 5 CKD exponentials).  ``wavelength=0.910`` reproduces the
  original keywords for use with a complete data tree.

* ``binding440`` — the binding smoke case (``binding/run_sos.py:561-604``):
  440 nm, WMO continental, MLS profile rescaled (H2O 2.906 g/cm2, O3 335
  DU), MOT 0.230, CKD mode 2, glitter wind 2 m/s n=1.33 albedo 0.02,
  principal plane at phi=35 deg, 24 Gauss angles.
"""

from __future__ import annotations


def demo_principal(res_root: str, mie_dir: str, wavelength: float = 0.765,
                   view: int = 1) -> dict:
    kw = {
        "-SOS_Main.Wa": str(wavelength),
        "-SOS_Main.ResRoot": res_root,
        "-ANG.Rad.NbGauss": "40",
        "-ANG.Thetas": "35.",
        "-AP.Psurf": "1013",
        "-AP.AerProfile.Type": "1",
        "-AP.HR": "8.0",
        "-AP.AerHS.HA": "2.0",
        "-AP.AbsProfile.Type": "1",
        "-AP.SpectralResol": "10",
        "-SOS.AbsModeCKD": "1",
        "-AER.DirMie": mie_dir,
        "-AER.Model": "1",
        "-AER.WMO.Model": "2",
        "-AER.Waref": "0.550",
        "-AER.AOTref": "0.3",
        "-SURF.Type": "1",
        "-SURF.Alb": "0.00",
        "-SURF.Ind": "1.34",
        "-SURF.Glitter.Wind": "2.0",
    }
    if view == 1:
        kw.update({"-SOS.View": "1", "-SOS.View.Phi": "0.",
                   "-SOS.ResFileUp": "SOS_Up_Demo.txt",
                   "-SOS.ResFileDown": "SOS_Down_Demo.txt"})
    else:
        kw.update({"-SOS.View": "2", "-SOS.View.Dphi": "30",
                   "-SOS.ResFileUp": "SOS_Up_DemoPolar.txt",
                   "-SOS.ResFileDown": "SOS_Down_DemoPolar.txt"})
    return kw


def demo_polar(res_root: str, mie_dir: str,
               wavelength: float = 0.765) -> dict:
    return demo_principal(res_root, mie_dir, wavelength, view=2)


def demo_binding440(res_root: str, mie_dir: str) -> dict:
    return {
        "-SOS_Main.Wa": "0.440",
        "-SOS_Main.ResRoot": res_root,
        "-AER.DirMie": mie_dir,
        "-AP.AbsProfile.Type": "2",
        "-AP.SpectralResol": "10",
        "-SOS.AbsModeCKD": "2",
        "-ANG.Thetas": "40.00",
        "-ANG.Rad.NbGauss": "24",
        "-ANG.Aer.NbGauss": "40",
        "-AP.MOT": "0.230",
        "-AP.AerProfile.Type": "1",
        "-AP.HR": "8",
        "-AP.AerHS.HA": "2",
        "-AP.H2O": "2.906",
        "-AP.O3": "335",
        "-AP.Psurf": "1013",
        "-AER.Waref": "0.55",
        "-AER.AOTref": "0.300",
        "-AER.Tronca": "1",
        "-AER.Model": "1",
        "-AER.WMO.Model": "1",
        "-SURF.Type": "1",
        "-SURF.Glitter.Wind": "2.0",
        "-SURF.Alb": "0.02",
        "-SURF.Ind": "1.33",
        "-SOS.View": "1",
        "-SOS.View.Phi": "35",
        "-SOS.IGmax": "30",
        "-SOS.ResBin": "SOS_Result.bin",
        "-SOS.Flux": "FicFlux.txt",
        "-SOS.Trans": "SOS_Transm.txt",
    }


CASES = {
    "principal": demo_principal,
    "polar": demo_polar,
    "binding440": demo_binding440,
}
