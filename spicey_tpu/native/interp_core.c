/* Native transient Newton loop for the host interp tier.
 *
 * The interp tier (analysis/interp.py) answers interactive single-circuit
 * transients without initializing any accelerator backend. Its Python
 * NumPy inner loop costs ~150 us per Newton pass in pure interpreter /
 * ufunc-dispatch overhead — two orders of magnitude more than the
 * arithmetic itself at reference-scale MNA sizes (N ~ 4..32). This file
 * is that loop in C: one call runs the WHOLE stepped Newton transient
 * (companion updates, device linearizations, dense partial-pivot
 * elimination, switch hysteresis, convergence tests, T-line history)
 * and returns the stacked solutions.
 *
 * Semantics mirror analysis/interp._interp_tran_nl (itself the host twin
 * of analysis/tran._tran_core): zero-seeded x per step
 * (simulateTRAN.ts:149), device junction seeds from the previous
 * timestep on iteration 0, nr="spicey" break-on-switch-stability or
 * nr="converged" |dx| <= tol*(1+|x|), and the same device formulas as
 * models/devices.py (transcribed, not approximated). Equivalence with
 * the NumPy loop is pinned at 1e-9 by tests/test_interp.py; behavioral
 * (B) sources stay on the Python path (their expression closures are
 * Python), so callers gate on that.
 *
 * Built on demand by spicey_tpu/native/__init__.py with cc -O2 -shared;
 * no external dependencies beyond libm.
 */

#include <math.h>
#include <stdlib.h>
#include <string.h>

#define EPS 1e-15   /* constants.py EPS (reference lib/constants/EPS.ts) */
#define GMIN 1e-12  /* constants.py GMIN (simulateTRAN.ts:95) */

/* dense Gaussian elimination with partial pivoting on [A|b], in place.
 * A: n x n row-major (stride n1), b: n. Returns 1 ok, 0 singular. */
static int ge_solve(double *A, double *b, double *x, int n, int n1)
{
    int i, j, k;
    for (k = 0; k < n; ++k) {
        int piv = k;
        double best = fabs(A[k * n1 + k]);
        for (i = k + 1; i < n; ++i) {
            double v = fabs(A[i * n1 + k]);
            if (v > best) { best = v; piv = i; }
        }
        if (best < EPS) return 0;
        if (piv != k) {
            for (j = k; j < n; ++j) {
                double t = A[k * n1 + j];
                A[k * n1 + j] = A[piv * n1 + j];
                A[piv * n1 + j] = t;
            }
            double t = b[k]; b[k] = b[piv]; b[piv] = t;
        }
        double inv = 1.0 / A[k * n1 + k];
        for (i = k + 1; i < n; ++i) {
            double f = A[i * n1 + k] * inv;
            if (f == 0.0) continue;
            for (j = k + 1; j < n; ++j)
                A[i * n1 + j] -= f * A[k * n1 + j];
            b[i] -= f * b[k];
        }
    }
    for (k = n - 1; k >= 0; --k) {
        double s = b[k];
        for (j = k + 1; j < n; ++j)
            s -= A[k * n1 + j] * x[j];
        x[k] = s / A[k * n1 + k];
        if (!isfinite(x[k])) return 0;
    }
    return 1;
}

/* 4-point admittance stamp into the padded matrix (ops/stamps.py) */
static void adm(double *A, int n1, int i1, int i2, double y)
{
    A[i1 * n1 + i1] += y;
    A[i2 * n1 + i2] += y;
    A[i1 * n1 + i2] -= y;
    A[i2 * n1 + i1] -= y;
}

static void vccs(double *A, int n1, int i1, int i2, int cp, int cn, double g)
{
    A[i1 * n1 + cp] += g;
    A[i1 * n1 + cn] -= g;
    A[i2 * n1 + cp] -= g;
    A[i2 * n1 + cn] += g;
}

static void cur(double *b, int i1, int i2, double I)
{
    b[i1] -= I;
    b[i2] += I;
}

/* diode charge q(v) and capacitance C(v) (models/devices.py
 * diode_charge_cap: diffusion at the limited current/conductance the
 * caller computed, depletion at the TRUE voltage) */
static void dq_cap(double vd, double i_d, double g_d, double tt,
                   double cjo, double vj, double m, double fc,
                   double *q_out, double *c_out)
{
    double fcv = fc * vj;
    double q_dep, c_dep;
    if (vd < fcv) {
        double arg = 1.0 - vd / vj;
        if (arg < 1e-12) arg = 1e-12;
        q_dep = cjo * vj / (1.0 - m) * (1.0 - pow(arg, 1.0 - m));
        c_dep = cjo * pow(arg, -m);
    } else {
        double f1 = cjo * vj / (1.0 - m) * (1.0 - pow(1.0 - fc, 1.0 - m));
        double c0 = cjo * pow(1.0 - fc, -(1.0 + m));
        q_dep = f1 + c0 * ((1.0 - fc * (1.0 + m)) * (vd - fcv)
                           + m / (2.0 * vj) * (vd * vd - fcv * fcv));
        c_dep = c0 * (1.0 - fc * (1.0 + m) + m * vd / vj);
    }
    *q_out = tt * i_d + q_dep;
    *c_out = tt * g_d + c_dep;
}

/* MOSFET level-1 linearization (models/devices.py mos_level1) */
static void mos1(double vgs, double vds, double beta, double vto,
                 double lam, double s,
                 double *gm_out, double *gds_out, double *ieq_out)
{
    double vgs_r = s * vgs, vds_r = s * vds;
    int swap = vds_r < 0.0;
    double vgs_e = swap ? vgs_r - vds_r : vgs_r;
    double vds_e = fabs(vds_r);
    double vov = vgs_e - s * vto;
    double one_lam = 1.0 + lam * vds_e;
    double i_fwd, gm_e, gds_e;
    if (vov <= 0.0) {
        i_fwd = 0.0; gm_e = 0.0; gds_e = 0.0;
    } else if (vds_e >= vov) {
        i_fwd = 0.5 * beta * vov * vov * one_lam;
        gm_e = beta * vov * one_lam;
        gds_e = 0.5 * beta * vov * vov * lam;
    } else {
        i_fwd = beta * (vov - 0.5 * vds_e) * vds_e * one_lam;
        gm_e = beta * vds_e * one_lam;
        gds_e = beta * (vov - vds_e) * one_lam
                + beta * (vov - 0.5 * vds_e) * vds_e * lam;
    }
    double i_r = swap ? -i_fwd : i_fwd;
    double gm_r = swap ? -gm_e : gm_e;
    double gds_r = swap ? gm_e + gds_e : gds_e;
    if (gds_r < GMIN) gds_r = GMIN;
    double i_d = s * i_r;
    *gm_out = gm_r;
    *gds_out = gds_r;
    *ieq_out = i_d - gm_r * vgs - gds_r * vds;
}

int spicey_interp_tran_nl(
    int n, int steps_p1, double dt_c, int max_nr, int converged,
    double tol_eff,
    const double *A_base,
    int n_v, const int *v_branch, int n_i, const int *i_idx,
    const double *vs_grid,
    int n_c, const int *c_idx, const double *gc,
    int n_l, const int *l_idx, const double *gl,
    int use_gamma, const double *gamma,
    int n_s, const int *s_idx, const double *s_g_on, const double *s_g_off,
    const double *s_von, const double *s_voff,
    int n_d, const int *d_idx, const double *d_is, const double *d_vth,
    double d_vmin, double d_vmax,
    int has_dchg, const double *d_tt, const double *d_cjo,
    const double *d_vj, const double *d_m, const double *d_fc,
    int n_m, const int *m_idx, const double *m_beta, const double *m_vto,
    const double *m_lam, const double *m_pol,
    int n_q, const int *q_idx, const double *q_is, const double *q_bf,
    const double *q_br, const double *q_pol, double q_vt,
    int has_qchg, const double *qchg,
    int n_t, const int *t_idx, const double *t_z0, const double *td_steps,
    int hist_len,
    const double *v_prev0, const double *i_prev0,
    double *xs, unsigned char *sw_states)
{
    const int n1 = n + 1;
    const int nsrc = n_v + n_i;
    int ok = 1;
    int step, it, e, i;

    double *A = malloc((size_t)n1 * n1 * sizeof(double));
    double *b = malloc((size_t)n1 * sizeof(double));
    double *bw = malloc((size_t)n1 * sizeof(double));
    double *x_pad = calloc((size_t)n1, sizeof(double));
    double *x_new = malloc((size_t)n * sizeof(double));
    double *v_prev = calloc(n_c ? n_c : 1, sizeof(double));
    double *i_prev = calloc(n_l ? n_l : 1, sizeof(double));
    double *vd_l_buf = calloc(n_l ? n_l : 1, sizeof(double));
    double *vd_prev = calloc(n_d ? n_d : 1, sizeof(double));
    double *q_prev_d = calloc(n_d ? n_d : 1, sizeof(double));
    double *vm_prev = calloc(n_m ? 2 * n_m : 1, sizeof(double));
    double *vq_prev = calloc(n_q ? 2 * n_q : 1, sizeof(double));
    double *q_prev_q = calloc(n_q ? 2 * n_q : 1, sizeof(double));
    unsigned char *is_on = calloc(n_s ? n_s : 1, 1);
    unsigned char *new_on = calloc(n_s ? n_s : 1, 1);
    double *w_hist = calloc(n_t ? (size_t)hist_len * n_t * 2 : 1,
                            sizeof(double));
    double *e_t = calloc(n_t ? 2 * n_t : 1, sizeof(double));
    double *tv = malloc((size_t)n1 * sizeof(double)); /* step-const RHS */

    if (!A || !b || !bw || !x_pad || !x_new || !v_prev || !i_prev
        || !vd_l_buf || !vd_prev || !q_prev_d || !vm_prev || !vq_prev
        || !q_prev_q || !is_on || !new_on || !w_hist || !e_t || !tv) {
        ok = 0;
        goto done;
    }
    if (v_prev0)
        memcpy(v_prev, v_prev0, (size_t)n_c * sizeof(double));
    if (i_prev0)
        memcpy(i_prev, i_prev0, (size_t)n_l * sizeof(double));

    for (step = 0; step < steps_p1 && ok; ++step) {
        /* delayed far-end Thevenin sources (tran.tline_read twin) */
        for (e = 0; e < n_t; ++e) {
            double p = (double)step - td_steps[e];
            double kf = floor(p);
            double frac = p - kf;
            long ki = (long)kf;
            double wk0 = 0.0, wk1 = 0.0, wk10 = 0.0, wk11 = 0.0;
            if (ki >= 0) {
                long row = ki % hist_len;
                wk0 = w_hist[(row * n_t + e) * 2 + 0];
                wk1 = w_hist[(row * n_t + e) * 2 + 1];
            }
            if (ki >= -1) {
                long row = (ki + 1) % hist_len;
                if (row < 0) row += hist_len;
                wk10 = w_hist[(row * n_t + e) * 2 + 0];
                wk11 = w_hist[(row * n_t + e) * 2 + 1];
            }
            /* E1 mirrors the FAR end's w2; E2 the near end's w1 */
            e_t[2 * e + 0] = (wk1 * (1.0 - frac) + wk11 * frac);
            e_t[2 * e + 1] = (wk0 * (1.0 - frac) + wk10 * frac);
        }

        /* per-step constant RHS */
        memset(tv, 0, (size_t)n1 * sizeof(double));
        for (e = 0; e < n_c; ++e)
            cur(tv, c_idx[2 * e], c_idx[2 * e + 1], -gc[e] * v_prev[e]);
        for (e = 0; e < n_l; ++e)
            cur(tv, l_idx[2 * e], l_idx[2 * e + 1], i_prev[e]);
        for (e = 0; e < n_v; ++e)
            tv[v_branch[e]] += vs_grid[(size_t)step * nsrc + e];
        for (e = 0; e < n_i; ++e)
            cur(tv, i_idx[2 * e], i_idx[2 * e + 1],
                vs_grid[(size_t)step * nsrc + n_v + e]);
        for (e = 0; e < n_t; ++e) {
            tv[t_idx[6 * e + 4]] += e_t[2 * e + 0];
            tv[t_idx[6 * e + 5]] += e_t[2 * e + 1];
        }

        memset(x_pad, 0, (size_t)n1 * sizeof(double));
        int done_flag = 0;
        for (it = 0; it < max_nr && !done_flag; ++it) {
            memcpy(A, A_base, (size_t)n1 * n1 * sizeof(double));
            memcpy(b, tv, (size_t)n1 * sizeof(double));

            for (e = 0; e < n_s; ++e)
                adm(A, n1, s_idx[4 * e], s_idx[4 * e + 1],
                    is_on[e] ? s_g_on[e] : s_g_off[e]);
            for (e = 0; e < n_d; ++e) {
                int ip = d_idx[2 * e], im = d_idx[2 * e + 1];
                double vd = (it == 0) ? vd_prev[e]
                                      : x_pad[ip] - x_pad[im];
                double vd_l = vd < d_vmin ? d_vmin
                             : (vd > d_vmax ? d_vmax : vd);
                double ev = exp(vd_l / d_vth[e]);
                double i_d = d_is[e] * (ev - 1.0);
                double g_d = d_is[e] / d_vth[e] * ev;
                if (g_d < GMIN) g_d = GMIN;
                double g_tot = g_d;
                double ieq = i_d - g_d * vd_l;
                if (has_dchg) {
                    double q_d, c_d;
                    dq_cap(vd, i_d, g_d, d_tt[e], d_cjo[e], d_vj[e],
                           d_m[e], d_fc[e], &q_d, &c_d);
                    double c_dep = c_d - d_tt[e] * g_d;
                    g_tot += c_d / dt_c;
                    ieq += (q_d - q_prev_d[e] - d_tt[e] * g_d * vd_l
                            - c_dep * vd) / dt_c;
                }
                adm(A, n1, ip, im, g_tot);
                cur(b, ip, im, ieq);
            }
            for (e = 0; e < n_m; ++e) {
                int d = m_idx[3 * e], g = m_idx[3 * e + 1],
                    s = m_idx[3 * e + 2];
                double vgs, vds;
                if (it == 0) {
                    vgs = vm_prev[2 * e];
                    vds = vm_prev[2 * e + 1];
                } else {
                    vgs = x_pad[g] - x_pad[s];
                    vds = x_pad[d] - x_pad[s];
                }
                double gm, gds, ieq;
                mos1(vgs, vds, m_beta[e], m_vto[e], m_lam[e], m_pol[e],
                     &gm, &gds, &ieq);
                adm(A, n1, d, s, gds);
                vccs(A, n1, d, s, g, s, gm);
                cur(b, d, s, ieq);
            }
            for (e = 0; e < n_q; ++e) {
                int c = q_idx[3 * e], bb = q_idx[3 * e + 1],
                    ee = q_idx[3 * e + 2];
                double vbe, vbc;
                if (it == 0) {
                    vbe = vq_prev[2 * e];
                    vbc = vq_prev[2 * e + 1];
                } else {
                    vbe = x_pad[bb] - x_pad[ee];
                    vbc = x_pad[bb] - x_pad[c];
                }
                /* models/devices.py bjt_ebers_moll, default clamp */
                double s = q_pol[e];
                double tsc = q_vt / 0.02585;  /* VT_300K */
                double lo = -1.0 * tsc, hi = 0.8 * tsc;
                double vbe_l = s * vbe, vbc_l = s * vbc;
                if (vbe_l < lo) vbe_l = lo;
                if (vbe_l > hi) vbe_l = hi;
                if (vbc_l < lo) vbc_l = lo;
                if (vbc_l > hi) vbc_l = hi;
                double ebe = exp(vbe_l / q_vt), ebc = exp(vbc_l / q_vt);
                double ibe = (q_is[e] / q_bf[e]) * (ebe - 1.0);
                double ibc = (q_is[e] / q_br[e]) * (ebc - 1.0);
                double ict = q_is[e] * (ebe - ebc);
                double gbe = (q_is[e] / q_bf[e]) / q_vt * ebe;
                double gbc = (q_is[e] / q_br[e]) / q_vt * ebc;
                double gmf = q_is[e] / q_vt * ebe;
                double gmr = q_is[e] / q_vt * ebc;
                if (gbe < GMIN) gbe = GMIN;
                if (gbc < GMIN) gbc = GMIN;
                if (gmf < GMIN) gmf = GMIN;
                if (gmr < GMIN) gmr = GMIN;
                double ibe_eq = s * (ibe - gbe * vbe_l);
                double ibc_eq = s * (ibc - gbc * vbc_l);
                double ict_eq = s * (ict - gmf * vbe_l + gmr * vbc_l);
                double gbe_tot = gbe, gbc_tot = gbc;
                if (has_qchg) {
                    /* junction charges: diffusion at the CURRENT-iterate
                     * clamped voltage, depletion at the true one
                     * (tran._bjt_junction_charge — note it uses x_pad,
                     * not the it==0 seed) */
                    double u_be = s * (x_pad[bb] - x_pad[ee]);
                    double u_bc = s * (x_pad[bb] - x_pad[c]);
                    const double *qp = qchg + 9 * e;
                    double tf = qp[0], tr = qp[1];
                    double cje = qp[2], vje = qp[3], mje = qp[4];
                    double cjc = qp[5], vjc = qp[6], mjc = qp[7];
                    double fc = qp[8];
                    double u, ul, evj, gd, qv, cv, qq, cc;
                    /* b-e junction */
                    u = u_be;
                    ul = u < lo ? lo : (u > hi ? hi : u);
                    evj = exp(ul / q_vt);
                    gd = q_is[e] / q_vt * evj;
                    if (gd < GMIN) gd = GMIN;
                    dq_cap(u, q_is[e] * (evj - 1.0), gd, tf, cje, vje,
                           mje, fc, &qq, &cc);
                    qv = tf * gd * (s * ul) + (cc - tf * gd) * (s * u);
                    gbe_tot += cc / dt_c;
                    ibe_eq += ((s * qq) - q_prev_q[2 * e] - qv) / dt_c;
                    /* b-c junction */
                    u = u_bc;
                    ul = u < lo ? lo : (u > hi ? hi : u);
                    evj = exp(ul / q_vt);
                    gd = q_is[e] / q_vt * evj;
                    if (gd < GMIN) gd = GMIN;
                    dq_cap(u, q_is[e] * (evj - 1.0), gd, tr, cjc, vjc,
                           mjc, fc, &qq, &cc);
                    cv = tr * gd * (s * ul) + (cc - tr * gd) * (s * u);
                    gbc_tot += cc / dt_c;
                    ibc_eq += ((s * qq) - q_prev_q[2 * e + 1] - cv) / dt_c;
                }
                adm(A, n1, bb, ee, gbe_tot);
                adm(A, n1, bb, c, gbc_tot);
                vccs(A, n1, c, ee, bb, ee, gmf);
                vccs(A, n1, c, ee, bb, c, -gmr);
                cur(b, bb, ee, ibe_eq);
                cur(b, bb, c, ibc_eq);
                cur(b, c, ee, ict_eq);
            }

            memcpy(bw, b, (size_t)n1 * sizeof(double));
            if (!ge_solve(A, bw, x_new, n, n1)) {
                ok = 0;
                break;
            }

            int switched = 0;
            for (e = 0; e < n_s; ++e) {
                int cp = s_idx[4 * e + 2], cn = s_idx[4 * e + 3];
                double vc = (cp < n ? x_new[cp] : 0.0)
                            - (cn < n ? x_new[cn] : 0.0);
                unsigned char on = is_on[e]
                    ? (unsigned char)(!(vc < s_voff[e]))
                    : (unsigned char)(vc > s_von[e]);
                new_on[e] = on;
                if (on != is_on[e]) switched = 1;
            }
            int settled;
            if (converged) {
                double delta = 0.0, amax = 0.0;
                for (i = 0; i < n; ++i) {
                    double d1 = fabs(x_new[i] - x_pad[i]);
                    double a1 = fabs(x_new[i]);
                    if (d1 > delta) delta = d1;
                    if (a1 > amax) amax = a1;
                }
                settled = !switched && delta <= tol_eff * (1.0 + amax);
            } else {
                settled = !switched;
            }
            memcpy(x_pad, x_new, (size_t)n * sizeof(double));
            x_pad[n] = 0.0;
            memcpy(is_on, new_on, (size_t)n_s);
            done_flag = settled;
        }
        if (!ok) break;

        memcpy(xs + (size_t)step * n, x_pad, (size_t)n * sizeof(double));
        memcpy(sw_states + (size_t)step * n_s, is_on, (size_t)n_s);

        /* state commit (simulateTRAN.ts:221-237 + extended state) */
        for (e = 0; e < n_c; ++e)
            v_prev[e] = x_pad[c_idx[2 * e]] - x_pad[c_idx[2 * e + 1]];
        if (n_l) {
            for (e = 0; e < n_l; ++e)
                vd_l_buf[e] = x_pad[l_idx[2 * e]] - x_pad[l_idx[2 * e + 1]];
            if (use_gamma) {
                for (e = 0; e < n_l; ++e) {
                    double s2 = 0.0;
                    for (i = 0; i < n_l; ++i)
                        s2 += gamma[(size_t)e * n_l + i] * vd_l_buf[i];
                    i_prev[e] += s2;
                }
            } else {
                for (e = 0; e < n_l; ++e)
                    i_prev[e] += gl[e] * vd_l_buf[e];
            }
        }
        for (e = 0; e < n_d; ++e) {
            vd_prev[e] = x_pad[d_idx[2 * e]] - x_pad[d_idx[2 * e + 1]];
            if (has_dchg) {
                double vd_c = vd_prev[e] < d_vmin ? d_vmin
                              : (vd_prev[e] > d_vmax ? d_vmax : vd_prev[e]);
                double ev_c = exp(vd_c / d_vth[e]);
                double gd = d_is[e] / d_vth[e] * ev_c;
                if (gd < GMIN) gd = GMIN;
                double qq, cc;
                dq_cap(vd_prev[e], d_is[e] * (ev_c - 1.0), gd, d_tt[e],
                       d_cjo[e], d_vj[e], d_m[e], d_fc[e], &qq, &cc);
                q_prev_d[e] = qq;
            }
        }
        for (e = 0; e < n_q && has_qchg; ++e) {
            int c = q_idx[3 * e], bb = q_idx[3 * e + 1],
                ee = q_idx[3 * e + 2];
            double s = q_pol[e];
            double tsc = q_vt / 0.02585;
            double lo = -1.0 * tsc, hi = 0.8 * tsc;
            const double *qp = qchg + 9 * e;
            double u, ul, evj, gd, qq, cc;
            u = s * (x_pad[bb] - x_pad[ee]);
            ul = u < lo ? lo : (u > hi ? hi : u);
            evj = exp(ul / q_vt);
            gd = q_is[e] / q_vt * evj;
            if (gd < GMIN) gd = GMIN;
            dq_cap(u, q_is[e] * (evj - 1.0), gd, qp[0], qp[2], qp[3],
                   qp[4], qp[8], &qq, &cc);
            q_prev_q[2 * e] = s * qq;
            u = s * (x_pad[bb] - x_pad[c]);
            ul = u < lo ? lo : (u > hi ? hi : u);
            evj = exp(ul / q_vt);
            gd = q_is[e] / q_vt * evj;
            if (gd < GMIN) gd = GMIN;
            dq_cap(u, q_is[e] * (evj - 1.0), gd, qp[1], qp[5], qp[6],
                   qp[7], qp[8], &qq, &cc);
            q_prev_q[2 * e + 1] = s * qq;
        }
        for (e = 0; e < n_m; ++e) {
            vm_prev[2 * e] = x_pad[m_idx[3 * e + 1]]
                             - x_pad[m_idx[3 * e + 2]];
            vm_prev[2 * e + 1] = x_pad[m_idx[3 * e]]
                                 - x_pad[m_idx[3 * e + 2]];
        }
        for (e = 0; e < n_q; ++e) {
            vq_prev[2 * e] = x_pad[q_idx[3 * e + 1]]
                             - x_pad[q_idx[3 * e + 2]];
            vq_prev[2 * e + 1] = x_pad[q_idx[3 * e + 1]]
                                 - x_pad[q_idx[3 * e]];
        }
        for (e = 0; e < n_t; ++e) {
            long row = step % hist_len;
            w_hist[(row * n_t + e) * 2 + 0] =
                x_pad[t_idx[6 * e]] - x_pad[t_idx[6 * e + 1]]
                + t_z0[e] * x_pad[t_idx[6 * e + 4]];
            w_hist[(row * n_t + e) * 2 + 1] =
                x_pad[t_idx[6 * e + 2]] - x_pad[t_idx[6 * e + 3]]
                + t_z0[e] * x_pad[t_idx[6 * e + 5]];
        }
    }

done:
    free(A); free(b); free(bw); free(x_pad); free(x_new);
    free(v_prev); free(i_prev); free(vd_l_buf); free(vd_prev);
    free(q_prev_d); free(vm_prev); free(vq_prev); free(q_prev_q);
    free(is_on); free(new_on); free(w_hist); free(e_t); free(tv);
    return ok;
}
