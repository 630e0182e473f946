// Native profile discretizer — C++ twin of profile.py's exponential paths.
//
// Re-design of reference SOS_PROFILE / SOS_DISC (src/SOS_PROFIL.F:224,1210).
// The adaptive layering + bisection tau->z inversion is inherently
// sequential host code; at CKD scale (hundreds to ~5^8 exponential-term
// profiles per run, src/SOS_PROC.F:3459-3466) the Python loop dominates the
// setup path, so this is the framework's native data-preparation component.
// The Python implementation in profile.py is the behavioral oracle: both
// perform the identical floating-point operation sequence, and
// tests/test_native_profil.py asserts exact agreement.
//
// Build: g++ -O3 -shared -fPIC profil.cc -o libprofil.so  (see build.py)

#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Consts {
  double toa_alt;            // CTE_TOA_ALT
  double delta_z;            // altitude step of the level-1 search
  double t_first;            // CTE_TOA_FIRST_LAYER_OPT_THICKNESS
  double tcouche;            // max layer optical thickness
  int nt_min;                // CTE_OS_NT_MIN
  int nt_max;                // CTE_OS_NT
  double threshold_tauabs;   // absorption cap (1.5)
  double threshold_dz;       // grid-merge altitude tolerance
};

double interp_tabs(double z, const double* altabs, const double* tabs,
                   int n_abs) {
  if (z > altabs[0]) return 0.0;
  int j = 1;
  while (j < n_abs && z < altabs[j]) ++j;
  if (j >= n_abs) j = n_abs - 1;
  const double zz = (z - altabs[j - 1]) / (altabs[j] - altabs[j - 1]);
  return (1.0 - zz) * tabs[j - 1] + zz * tabs[j];
}

// Bisection tau->z inversion (SOS_DISC, src/SOS_PROFIL.F:1210).
double disc(double dt, double ta, double ha, double tr, double hr,
            const double* tabs, const double* altabs, int n_abs,
            double tim1, double zmax_init, double tg_zlim, double zlim) {
  const double ti = tim1 + dt;
  double zmax = zmax_init;
  double zmin = zlim;
  for (int it = 0; it < 10000; ++it) {
    const double zmoy = 0.5 * (zmax + zmin);
    double tg = 0.0;
    if (tg_zlim > 0.0) {
      if (zmoy > altabs[0]) {
        tg = tabs[0];
      } else {
        // bounded, unlike the reference's DO WHILE (src/SOS_PROFIL.F
        // SOS_DISC) which reads past ALTABS when the bisection midpoint
        // falls below the lowest table altitude (zlim can land fractionally
        // under it); clamping extrapolates the bottom layer linearly
        int j = 1;
        while (j < n_abs && zmoy < altabs[j]) ++j;
        if (j >= n_abs) j = n_abs - 1;
        const double zz =
            (zmoy - altabs[j - 1]) / (altabs[j] - altabs[j - 1]);
        tg = (1.0 - zz) * tabs[j - 1] + zz * tabs[j];
      }
    }
    const double tzmoy =
        ta * std::exp(-zmoy / ha) + tr * std::exp(-zmoy / hr) + tg;
    if (std::fabs(ti - tzmoy) < 1.0e-6 || zmoy == 0.0) return zmoy;
    if (ti - tzmoy < 0.0)
      zmin = zmoy;
    else
      zmax = zmoy;
  }
  return -1.0;  // non-convergence sentinel (caller raises)
}

void layer_counts(double ttot, const Consts& c, int* nt, double* t_first,
                  double* t_layer) {
  if (ttot / c.nt_min <= c.t_first) {
    *nt = c.nt_min;
    *t_layer = ttot / *nt;
    *t_first = *t_layer;
  } else if (ttot / c.nt_min < c.tcouche) {
    *nt = c.nt_min + 1;
    *t_first = c.t_first;
    *t_layer = (ttot - *t_first) / c.nt_min;
  } else {
    *t_first = c.t_first;
    *nt = static_cast<int>((ttot - *t_first) / c.tcouche);
    *t_layer = (ttot - *t_first) / *nt;
    *nt += 1;
  }
}

// Scattering-only exponential profile (src/SOS_PROFIL.F:398-489).
int exp_no_gas(double tr, double hr, double ta, double ha, const Consts& c,
               double* zprof, double* h, double* pca, double* pcm) {
  int nt;
  double t_first, t_layer;
  layer_counts(tr + ta, c, &nt, &t_first, &t_layer);
  zprof[0] = c.toa_alt;
  h[0] = 0.0;
  if (ta == 0.0) {
    for (int i = 1; i <= nt; ++i) {
      h[i] = (i == 1) ? t_first : (i - 1) * t_layer + t_first;
      pcm[i] = 1.0;
      pca[i] = 0.0;
      zprof[i] = hr * std::log(tr / h[i]);
    }
    pcm[0] = 1.0;
    pca[0] = 0.0;
    return nt;
  }
  double dtau = 0.0, z = c.toa_alt;
  while (dtau < t_first) {
    z -= c.delta_z;
    dtau = tr * std::exp(-z / hr) + ta * std::exp(-z / ha);
  }
  zprof[1] = z;
  double vr = tr * std::exp(-z / hr);
  double va = ta * std::exp(-z / ha);
  double vr_prev = vr, va_prev = va;
  h[1] = dtau;
  pcm[1] = vr / dtau;
  pca[1] = va / dtau;
  pcm[0] = pcm[1];
  pca[0] = pca[1];
  for (int i = 2; i < nt; ++i) {
    z = disc(t_layer, ta, ha, tr, hr, nullptr, nullptr, 0, h[i - 1],
             zprof[1], 0.0, 0.0);
    if (z < 0.0) return -1;
    zprof[i] = z;
    vr = tr * std::exp(-z / hr);
    va = ta * std::exp(-z / ha);
    h[i] = vr + va;
    const double dvr = vr - vr_prev;
    const double dva = va - va_prev;
    pcm[i] = dvr / (dvr + dva);
    pca[i] = dva / (dvr + dva);
    vr_prev = vr;
    va_prev = va;
  }
  zprof[nt] = 0.0;
  h[nt] = tr + ta;
  {
    const double dvr = tr - vr_prev;
    const double dva = ta - va_prev;
    pcm[nt] = dvr / (dvr + dva);
    pca[nt] = dva / (dvr + dva);
  }
  return nt;
}

}  // namespace

extern "C" {

// Returns nt (levels = nt+1) or -1 on bisection failure.  Output arrays
// must hold nt_max + 2 doubles.
int rtsos_exp_profile(double tr, double hr, double ta, double ha,
                      const double* altabs, const double* tabs, int n_abs,
                      const Consts* c, double* zprof, double* h,
                      double* pca, double* pcm) {
  if (n_abs == 0 || tabs[n_abs - 1] == 0.0)
    return exp_no_gas(tr, hr, ta, ha, *c, zprof, h, pca, pcm);

  const double tabs_tot = tabs[n_abs - 1];

  // the no-gas grid whose levels are forced into the merged grid
  double* ng_z = new double[c->nt_max + 2];
  double* ng_h = new double[c->nt_max + 2];
  double* ng_a = new double[c->nt_max + 2];
  double* ng_m = new double[c->nt_max + 2];
  const int nt_ng = exp_no_gas(tr, hr, ta, ha, *c, ng_z, ng_h, ng_a, ng_m);
  if (nt_ng < 0) {
    delete[] ng_z; delete[] ng_h; delete[] ng_a; delete[] ng_m;
    return -1;
  }

  double zlim, tg_zlim, t_first, t_layer, ttot_zlim;
  if (tabs_tot > c->threshold_tauabs) {
    // strong absorption: stop at ZLIM (src/SOS_PROFIL.F:528-556)
    int i = 0;
    while (tabs[i] < c->threshold_tauabs) ++i;
    const double alin =
        (tabs[i] - tabs[i - 1]) / (altabs[i] - altabs[i - 1]);
    const double blin = tabs[i] - alin * altabs[i];
    tg_zlim = c->threshold_tauabs;
    zlim = (tg_zlim - blin) / alin;
    t_first = c->t_first;
    ttot_zlim =
        ta * std::exp(-zlim / ha) + tr * std::exp(-zlim / hr) + tg_zlim;
    t_layer = (ttot_zlim - t_first) / (c->nt_max - nt_ng - 2);
    if (t_layer < c->tcouche) t_layer = c->tcouche;
  } else {
    zlim = 0.0;
    tg_zlim = tabs_tot;
    int nt_dummy;
    layer_counts(tr + ta + tabs_tot, *c, &nt_dummy, &t_first, &t_layer);
    ttot_zlim =
        ta * std::exp(-zlim / ha) + tr * std::exp(-zlim / hr) + tg_zlim;
  }

  double* hm = new double[c->nt_max + 2]();
  double* ha_arr = new double[c->nt_max + 2]();
  double* hg = new double[c->nt_max + 2]();
  std::memset(h, 0, sizeof(double) * (c->nt_max + 2));
  std::memset(zprof, 0, sizeof(double) * (c->nt_max + 2));
  std::memset(pca, 0, sizeof(double) * (c->nt_max + 2));
  std::memset(pcm, 0, sizeof(double) * (c->nt_max + 2));

  int nt = 1;
  double z = c->toa_alt;
  int ing = 1;
  double zing = ng_z[1];

  while ((ttot_zlim - h[nt - 1]) > t_layer) {
    const int i = nt;
    if (i == 1) {
      double dtau = 0.0;
      while (dtau < t_first) {
        z -= c->delta_z;
        const double vg = interp_tabs(z, altabs, tabs, n_abs);
        const double vr = tr * std::exp(-z / hr);
        const double va = ta * std::exp(-z / ha);
        dtau = vr + va + vg;
      }
      zprof[1] = z;
      h[1] = dtau;
      ing = 1;
    } else {
      z = disc(t_layer, ta, ha, tr, hr, tabs, altabs, n_abs, h[i - 1],
               zprof[1], tg_zlim, zlim);
      if (z < 0.0) { nt = -2; break; }
    }

    // force the no-gas grid levels in (src/SOS_PROFIL.F:680-691)
    if (z <= zing) {
      z = zing;
      ++ing;
      zing = ng_z[(ing < nt_ng) ? ing : nt_ng];
    } else if ((z - zing) <= c->threshold_dz) {
      ++ing;
      zing = ng_z[(ing < nt_ng) ? ing : nt_ng];
    }

    zprof[i] = z;
    const double vg =
        (z <= altabs[0]) ? interp_tabs(z, altabs, tabs, n_abs) : tabs[0];
    const double vr = tr * std::exp(-z / hr);
    const double va = ta * std::exp(-z / ha);
    hm[i] = vr;
    ha_arr[i] = va;
    hg[i] = vg;
    h[i] = va + vr + vg;
    const double dva = va - ha_arr[i - 1];
    const double dvr = vr - hm[i - 1];
    const double dvg = vg - hg[i - 1];
    pca[i] = dva / (dva + dvr + dvg);
    pcm[i] = dvr / (dva + dvr + dvg);
    ++nt;
    if (nt > c->nt_max) break;
  }

  if (nt > 0) {
    // bottom level at ZLIM (src/SOS_PROFIL.F:707-729)
    if ((zprof[nt - 1] - zlim) <= c->threshold_dz) --nt;
    zprof[nt] = zlim;
    const double vr = tr * std::exp(-zlim / hr);
    const double va = ta * std::exp(-zlim / ha);
    hm[nt] = vr;
    ha_arr[nt] = va;
    hg[nt] = tg_zlim;
    h[nt] = vr + va + tg_zlim;
    double dva = va - ha_arr[nt - 1];
    double dvr = vr - hm[nt - 1];
    double dvg = tg_zlim - hg[nt - 1];
    pca[nt] = dva / (dva + dvr + dvg);
    pcm[nt] = dvr / (dva + dvr + dvg);

    zprof[0] = c->toa_alt;
    pca[0] = pca[1];
    pcm[0] = pcm[1];

    if (tabs_tot > c->threshold_tauabs) {
      // closing opaque layer to the surface (src/SOS_PROFIL.F:745-771)
      ++nt;
      hm[nt] = tr;
      ha_arr[nt] = ta;
      hg[nt] = tabs_tot;
      h[nt] = tr + ta + tabs_tot;
      dvr = hm[nt] - hm[nt - 1];
      dva = ha_arr[nt] - ha_arr[nt - 1];
      dvg = hg[nt] - hg[nt - 1];
      pca[nt] = dva / (dva + dvr + dvg);
      pcm[nt] = dvr / (dva + dvr + dvg);
      zprof[nt] = 0.0;
    }
  }

  delete[] ng_z; delete[] ng_h; delete[] ng_a; delete[] ng_m;
  delete[] hm; delete[] ha_arr; delete[] hg;
  return (nt == -2) ? -1 : nt;
}

// Batched driver over CKD terms: tabs_batch is (n_terms, n_abs) row-major;
// outputs are (n_terms, nt_max+2) row-major; nts receives each term's nt.
void rtsos_exp_profiles_batch(int n_terms, double tr, double hr, double ta,
                              double ha, const double* altabs,
                              const double* tabs_batch, int n_abs,
                              const Consts* c, double* zprof, double* h,
                              double* pca, double* pcm, int* nts) {
  const int stride = c->nt_max + 2;
  // terms are independent: split the batch over the host cores (the
  // serial loop was ~0.5 s per 2000 terms of a spectral LUT sweep)
  unsigned hw = std::thread::hardware_concurrency();
  int n_workers = hw ? static_cast<int>(hw) : 1;
  if (n_workers > n_terms) n_workers = n_terms;
  auto run = [&](int lo, int hi) {
    for (int t = lo; t < hi; ++t) {
      nts[t] = rtsos_exp_profile(tr, hr, ta, ha, altabs,
                                 tabs_batch + t * n_abs, n_abs, c,
                                 zprof + t * stride, h + t * stride,
                                 pca + t * stride, pcm + t * stride);
    }
  };
  if (n_workers <= 1) {
    run(0, n_terms);
    return;
  }
  std::vector<std::thread> workers;
  int per = (n_terms + n_workers - 1) / n_workers;
  for (int w = 0; w < n_workers; ++w) {
    int lo = w * per;
    int hi = lo + per < n_terms ? lo + per : n_terms;
    if (lo >= hi) break;
    workers.emplace_back(run, lo, hi);
  }
  for (auto& th : workers) th.join();
}

}  // extern "C"
