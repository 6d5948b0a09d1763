"""Kernelized path-replay backward for the fused bounce megakernel.

Round-1's backward pass ran on the XLA scan path at ~0.25 Mrays/s: each
rematerialized bounce step lowers to ~26 forward + ~40 transpose fusions
with a fixed ~1.2 ms launch overhead apiece on this TPU runtime. This
module gives the K-step fused bounce chain a `jax.custom_vjp` whose
backward is itself ONE Pallas launch per chain:

  * forward  = the existing forward megakernel (ops.megakernel), with the
    K input states as the only residual — the O(1)-in-depth memory of
    path-replay backprop (SURVEY.md §5.7);
  * backward = a replay kernel: re-run the K bounce steps from the saved
    input state (every draw is counter-addressed, so replay is exact),
    storing each step's state + winner ids + discrete decisions in VMEM;
    then sweep the K steps in reverse, re-deriving each step from the
    *winner's* packed attributes as a compact differentiable function and
    transposing it with `jax.vjp` **inside the kernel body** (Pallas
    kernels are traced JAX code, so reverse-mode AD composes with Mosaic).

Gradient routing is TPU-native throughout: winner attributes are
re-selected with the forward's one-hot MXU contraction, and the adjoint
scatter into the (24, S) primitive pack is the exact transpose — another
one-hot MXU contraction per primitive tile. The packs themselves
(ops.megakernel.pack_*) are differentiable jnp functions of SceneArrays,
so XLA chains d_pack -> d_sphere_c0 / d_quad_u / d_mat_fuzz / ... and
d_state_in -> camera parameters automatically.

Discrete decisions (argmin winner, chosen quadratic root, front-face,
dielectric branch, metal absorption, checker parity, texel indices) are
replayed and closed over as constants — detached sampling exactly as the
XLA path does (render.py docstring).

Scope: every scene the forward megakernel supports except constant media
(`supports_backward`); media scenes fall back to the XLA scan path.

Reference being replaced: the recursive `trace` of
/root/reference/src/lib.rs:50-71, which has no backward at all.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import megakernel as mk
from ..scene import (MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC,
                     MAT_LAMBERTIAN, MAT_METAL, SceneArrays)

TN = mk.TN
TS = mk.TS
INF = mk.INF


def supports_backward(scene: SceneArrays) -> bool:
    """Kernel-vjp scope: everything the forward megakernel shades except
    constant media (their stochastic boundary-interval sampling couples
    the solid t_max into the decision; the XLA scan path keeps exact
    gradients there). Boxes replay like quads: the slab face is a
    discrete decision, the face t and the rotated normal are re-derived
    from the winner's packed rows."""
    return mk.supports(scene) and not scene.has_media


# ---------------------------------------------------------------------------
# The compact differentiable step: re-derive one bounce from the winner's
# selected attributes. Mirrors ops.megakernel._one_bounce, but with every
# discrete decision supplied as a replayed constant and every t/normal/
# albedo recomputed from the winner rows (no loops -> cleanly vjp-able).
# ---------------------------------------------------------------------------


def _make_diff_step(c, *, moving, has_quads, has_boxes, has_rot_boxes,
                    has_perlin, has_images,
                    img_ah, img_aw, n_media=0, t_min=1e-3, rr_depth=0):
    """Build g(*diff_ins) -> 13 continuous output rows.

    c: dict of replayed constants (closure, not differentiated).
    diff_ins order: 13 state rows (o, d, time, thr, pend), sel_s,
    [sel_q], [sel_b], 6 bg rows, [atlas], then for each medium slot
    11 rows (center xyz, radius, half xyz, neg_inv_density, albedo
    rgb). Media constants in c: use_med, win_med, med_is_sph[mi],
    med_rot[mi] (9 scalars), med_logu[mi].

    rr_depth: Russian roulette (megakernel._one_bounce's in-kernel
    form). The continuation decision is already folded into the
    replayed c["survives"]; here only the survivor's throughput weight
    changes to th*at/p with p = clamp(max component of th*at, 0.05, 1)
    DETACHED (stop_gradient) — the RR weight is a replayed sampling
    constant, like the discrete decisions, so the gradient estimator
    stays the same detached-sampling class as reflect-vs-refract
    (SURVEY.md §7). Requires c["rr_on"] (bounce >= rr_depth)."""

    def g(*args):
        (ox, oy, oz, dx, dy, dz, time, thx, thy, thz,
         pex, pey, pez) = args[:13]
        sel_s = args[13]
        i = 14
        if has_quads:
            sel_q = args[i]
            i += 1
        if has_boxes:
            sel_b = args[i]
            i += 1
        bg6 = args[i:i + 6]
        i += 6
        atlas = None
        if has_images:
            atlas = args[i]
            i += 1
        med_ins = []
        for _mi in range(n_media):
            med_ins.append(args[i:i + 11])
            i += 11

        a = dx * dx + dy * dy + dz * dz
        o_dot_d = ox * dx + oy * dy + oz * dz
        o_dot_o = ox * ox + oy * oy + oz * oz
        inv_a = 1.0 / a
        d_len = jnp.sqrt(a)

        # --- sphere winner t (same math as the tile loop, winner rows) --
        if moving:
            cxt = sel_s[0:1] + time * sel_s[4:5]
            cyt = sel_s[1:2] + time * sel_s[5:6]
            czt = sel_s[2:3] + time * sel_s[6:7]
        else:
            cxt, cyt, czt = sel_s[0:1], sel_s[1:2], sel_s[2:3]
        d_c = dx * cxt + dy * cyt + dz * czt
        o_c = ox * cxt + oy * cyt + oz * czt
        c_sq = cxt * cxt + cyt * cyt + czt * czt
        half_b = o_dot_d - d_c
        c_coef = o_dot_o - 2.0 * o_c + c_sq - sel_s[3:4]
        disc = half_b * half_b - a * c_coef
        # Double-where: masked lanes (miss / quad-won) must not leak NaN
        # through the sqrt vjp (g/(2*sqrt(0)) = NaN even with g = 0).
        disc_ok = jax.lax.stop_gradient(disc > 0.0)
        sq = jnp.sqrt(jnp.where(disc_ok, disc, 1.0))
        root0 = (-half_b - sq) * inv_a
        root1 = (-half_b + sq) * inv_a
        # Root choice is discrete: replay picks the root the forward
        # accepted (the one landing on the stored t).
        pick0 = jax.lax.stop_gradient(
            jnp.abs(root0 - c["t_hit"]) <= jnp.abs(root1 - c["t_hit"]))
        t_sph = jnp.where(pick0, root0, root1)

        # --- box winner t (slab face re-derived from the winner rows;
        # which of the 6 faces is a discrete decision — the candidate
        # nearest the stored t is replayed) ---------------------------------
        if has_boxes:
            bwx = ox - sel_b[0:1]
            bwy = oy - sel_b[1:2]
            bwz = oz - sel_b[2:3]
            if has_rot_boxes:
                cthb = sel_b[6:7]
                sthb = sel_b[7:8]
                obx = cthb * bwx - sthb * bwz
                obz = sthb * bwx + cthb * bwz
                dbx = cthb * dx - sthb * dz
                dbz = sthb * dx + cthb * dz
            else:
                obx, obz = bwx, bwz
                dbx, dbz = dx, dz
            oby, dby = bwy, dy
            t_box = jnp.zeros_like(t_sph)
            best = jnp.full_like(t_sph, INF)
            for ob, db, hk in ((obx, dbx, sel_b[3:4]),
                               (oby, dby, sel_b[4:5]),
                               (obz, dbz, sel_b[5:6])):
                ok_db = jax.lax.stop_gradient(jnp.abs(db) > 1e-12)
                inv_db = 1.0 / jnp.where(ok_db, db, 1.0)
                for side in (-1.0, 1.0):
                    t_f = (side * hk - ob) * inv_db
                    err = jax.lax.stop_gradient(
                        jnp.where(ok_db, jnp.abs(t_f - c["t_hit"]), INF))
                    take = jax.lax.stop_gradient(err < best)
                    best = jnp.where(take, err, best)
                    t_box = jnp.where(take, t_f, t_box)
        else:
            t_box = t_sph

        # --- quad winner t ----------------------------------------------
        t_solid = (jnp.where(c["use_b"], t_box, t_sph) if has_boxes
                   else t_sph)
        if has_quads:
            nqx, nqy, nqz = sel_q[0:1], sel_q[1:2], sel_q[2:3]
            denom = dx * nqx + dy * nqy + dz * nqz
            o_n = ox * nqx + oy * nqy + oz * nqz
            not_par = jax.lax.stop_gradient(
                jnp.abs(denom) > sel_q[12:13] * d_len)
            t_quad = (sel_q[9:10] - o_n) / jnp.where(not_par, denom, 1.0)
            t_hit = jnp.where(c["use_q"], t_quad, t_solid)
        else:
            t_hit = t_solid

        # --- winner medium t + albedo (RTTNW ch. 9; decisions —
        # which medium, scatter-vs-pass — replayed; the continuous
        # dependence is boundary entry t, neg_inv_density and albedo,
        # mirroring the XLA scan path's plain-min/max subgradients) ---
        if n_media > 0:
            inv_dlen_m = 1.0 / jnp.maximum(d_len, 1e-20)
            t_med = jnp.zeros_like(t_hit)
            amr = jnp.zeros_like(t_hit)
            amg = jnp.zeros_like(t_hit)
            amb = jnp.zeros_like(t_hit)
            for mi in range(n_media):
                (mcx, mcy, mcz, mr, mhx, mhy, mhz, mnid, mar, mag,
                 mab) = med_ins[mi]
                ocx = ox - mcx
                ocy = oy - mcy
                ocz = oz - mcz
                hb = ocx * dx + ocy * dy + ocz * dz
                cc = (ocx * ocx + ocy * ocy + ocz * ocz) - mr * mr
                disc_m = hb * hb - a * cc
                dok = jax.lax.stop_gradient(disc_m > 0.0)
                sqm = jnp.sqrt(jnp.where(dok, disc_m, 1.0))
                sph_enter = (-hb - sqm) * inv_a
                lo_m = jnp.full_like(t_hit, -INF)
                rot = c["med_rot"][mi]  # 9 replayed scalars, row-major
                halves = (mhx, mhy, mhz)
                for k in range(3):
                    ob = (rot[k] * ocx + rot[3 + k] * ocy
                          + rot[6 + k] * ocz)
                    db = rot[k] * dx + rot[3 + k] * dy + rot[6 + k] * dz
                    hk = halves[k]
                    par = jax.lax.stop_gradient(jnp.abs(db) <= 1e-12)
                    inv_db = 1.0 / jnp.where(par, 1.0, db)
                    t1m = (-hk - ob) * inv_db
                    t2m = (hk - ob) * inv_db
                    klo = jnp.minimum(t1m, t2m)
                    inside = jax.lax.stop_gradient(jnp.abs(ob) <= hk)
                    klo = jnp.where(par,
                                    jnp.where(inside, -INF, INF), klo)
                    lo_m = jnp.maximum(lo_m, klo)
                t_enter = jnp.where(c["med_is_sph"][mi], sph_enter,
                                    lo_m)
                te = jnp.maximum(jnp.maximum(t_enter, t_min), 0.0)
                hit_dist = mnid * c["med_logu"][mi]
                t_mi = te + hit_dist * inv_dlen_m
                oh = jax.lax.stop_gradient(
                    c["win_med"] == jnp.float32(mi))
                t_med = jnp.where(oh, t_mi, t_med)
                amr = jnp.where(oh, mar, amr)
                amg = jnp.where(oh, mag, amg)
                amb = jnp.where(oh, mab, amb)
            t_hit = jnp.where(c["use_med"], t_med, t_hit)

        t_eff = jnp.where(c["hit"], t_hit, 0.0)
        px_ = ox + t_eff * dx
        py_ = oy + t_eff * dy
        pz_ = oz + t_eff * dz

        # --- winner surface normal --------------------------------------
        if moving:
            scx = sel_s[0:1] + time * sel_s[4:5]
            scy = sel_s[1:2] + time * sel_s[5:6]
            scz = sel_s[2:3] + time * sel_s[6:7]
        else:
            scx, scy, scz = sel_s[0:1], sel_s[1:2], sel_s[2:3]
        srad = sel_s[18:19]
        srad_ok = jax.lax.stop_gradient(jnp.abs(srad) > 1e-20)
        inv_r = 1.0 / jnp.where(srad_ok, srad, 1.0)
        sonx = (px_ - scx) * inv_r
        sony = (py_ - scy) * inv_r
        sonz = (pz_ - scz) * inv_r

        outx, outy, outz = sonx, sony, sonz
        aux_v = sel_s[9:10]
        c1r, c1g, c1b = sel_s[10:11], sel_s[11:12], sel_s[12:13]
        c2r, c2g, c2b = sel_s[13:14], sel_s[14:15], sel_s[15:16]
        texscale = sel_s[17:18]

        if has_boxes:
            # Outward normal: face axis/sign are discrete (re-derived
            # with stop_gradient exactly as the forward kernel does);
            # the only continuous dependence is the rotation rows.
            bpx = px_ - sel_b[0:1]
            bpy = py_ - sel_b[1:2]
            bpz = pz_ - sel_b[2:3]
            if has_rot_boxes:
                bqx = cthb * bpx - sthb * bpz
                bqz = sthb * bpx + cthb * bpz
            else:
                bqx, bqz = bpx, bpz
            bqy = bpy
            fxb = jnp.abs(bqx) - sel_b[3:4]
            fyb = jnp.abs(bqy) - sel_b[4:5]
            fzb = jnp.abs(bqz) - sel_b[5:6]
            use_xb = jax.lax.stop_gradient((fxb >= fyb) & (fxb >= fzb))
            use_yb = jax.lax.stop_gradient(
                jnp.logical_not(use_xb) & (fyb >= fzb))
            sgnx = jax.lax.stop_gradient(
                jnp.where(bqx >= 0.0, 1.0, -1.0))
            sgny = jax.lax.stop_gradient(
                jnp.where(bqy >= 0.0, 1.0, -1.0))
            sgnz = jax.lax.stop_gradient(
                jnp.where(bqz >= 0.0, 1.0, -1.0))
            xbf = use_xb.astype(jnp.float32)
            ybf = use_yb.astype(jnp.float32)
            zbf = 1.0 - xbf - ybf
            nbx = xbf * sgnx
            nby = ybf * sgny
            nbz = zbf * sgnz
            if has_rot_boxes:
                bnx = cthb * nbx + sthb * nbz
                bnz = -sthb * nbx + cthb * nbz
            else:
                bnx, bnz = nbx, nbz
            outx = jnp.where(c["use_b"], bnx, outx)
            outy = jnp.where(c["use_b"], nby, outy)
            outz = jnp.where(c["use_b"], bnz, outz)
            aux_v = jnp.where(c["use_b"], sel_b[10:11], aux_v)
            c1r = jnp.where(c["use_b"], sel_b[11:12], c1r)
            c1g = jnp.where(c["use_b"], sel_b[12:13], c1g)
            c1b = jnp.where(c["use_b"], sel_b[13:14], c1b)
            c2r = jnp.where(c["use_b"], sel_b[14:15], c2r)
            c2g = jnp.where(c["use_b"], sel_b[15:16], c2g)
            c2b = jnp.where(c["use_b"], sel_b[16:17], c2b)
            texscale = jnp.where(c["use_b"], sel_b[18:19], texscale)

        if has_quads:
            nn = (sel_q[0:1] ** 2 + sel_q[1:2] ** 2 + sel_q[2:3] ** 2)
            nn_ok = jax.lax.stop_gradient(nn > 1e-20)
            qinv = jax.lax.rsqrt(jnp.where(nn_ok, nn, 1.0))
            outx = jnp.where(c["use_q"], sel_q[0:1] * qinv, outx)
            outy = jnp.where(c["use_q"], sel_q[1:2] * qinv, outy)
            outz = jnp.where(c["use_q"], sel_q[2:3] * qinv, outz)
            aux_v = jnp.where(c["use_q"], sel_q[15:16], aux_v)
            c1r = jnp.where(c["use_q"], sel_q[16:17], c1r)
            c1g = jnp.where(c["use_q"], sel_q[17:18], c1g)
            c1b = jnp.where(c["use_q"], sel_q[18:19], c1b)
            c2r = jnp.where(c["use_q"], sel_q[19:20], c2r)
            c2g = jnp.where(c["use_q"], sel_q[20:21], c2g)
            c2b = jnp.where(c["use_q"], sel_q[21:22], c2b)
            texscale = jnp.where(c["use_q"], sel_q[23:24], texscale)

        sgn = jnp.where(c["front"], 1.0, -1.0)
        nx_ = outx * sgn
        ny_ = outy * sgn
        nz_ = outz * sgn
        if n_media > 0:
            # Medium "surface": arbitrary constant normal (isotropic
            # scatter ignores it; kills the sphere-winner normal's
            # spurious gradient on medium lanes).
            nx_ = jnp.where(c["use_med"], 1.0, nx_)
            ny_ = jnp.where(c["use_med"], 0.0, ny_)
            nz_ = jnp.where(c["use_med"], 0.0, nz_)

        # --- albedo (checker parity / texel ids replayed) ----------------
        albr = jnp.where(c["use_c2"], c2r, c1r)
        albg = jnp.where(c["use_c2"], c2g, c1g)
        albb = jnp.where(c["use_c2"], c2b, c1b)
        if has_perlin:
            marble = 0.5 * (1.0 + jnp.sin(
                texscale * pz_ + 10.0 * mk._turb_rows(px_, py_, pz_)))
            albr = jnp.where(c["is_per"], marble * c1r, albr)
            albg = jnp.where(c["is_per"], marble * c1g, albg)
            albb = jnp.where(c["is_per"], marble * c1b, albb)
        if has_images:
            # Texel indices are replayed constants (nearest-neighbor
            # lookup has zero geometric gradient, like the XLA path);
            # the one-hot contractions keep d_atlas on the MXU.
            iah = atlas.shape[0]
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (iah, TN), 0)
            oh_y = (row_iota == c["img_row"]).astype(jnp.float32)
            # Same exact 3-pass split as the forward kernel; its vjp
            # yields d_atlas contributions bf16-rounded per pass (images
            # are not in diff.DIFFERENTIABLE_FIELDS, so this is not a
            # user-visible gradient).
            r_cols = mk._onehot_dot(atlas, oh_y, (((0,), (0,)), ((), ())))
            x_iota = jax.lax.broadcasted_iota(jnp.int32, (img_aw, TN), 0)
            oh_x = (x_iota == c["xi"]).astype(jnp.float32)
            img_r = jnp.sum(r_cols[0:img_aw] * oh_x, axis=0,
                            keepdims=True)
            img_g = jnp.sum(r_cols[img_aw:2 * img_aw] * oh_x, axis=0,
                            keepdims=True)
            img_b = jnp.sum(r_cols[2 * img_aw:3 * img_aw] * oh_x, axis=0,
                            keepdims=True)
            albr = jnp.where(c["is_img"], img_r, albr)
            albg = jnp.where(c["is_img"], img_g, albg)
            albb = jnp.where(c["is_img"], img_b, albb)
        if n_media > 0:
            albr = jnp.where(c["use_med"], amr, albr)
            albg = jnp.where(c["use_med"], amg, albg)
            albb = jnp.where(c["use_med"], amb, albb)

        # --- scatter (draws + decisions replayed) -------------------------
        ux, uy_, uz, sx, sy, sz, _u_choice = c["draws"]
        ldx = jnp.where(c["degen"], nx_, nx_ + ux)
        ldy = jnp.where(c["degen"], ny_, ny_ + uy_)
        ldz = jnp.where(c["degen"], nz_, nz_ + uz)

        inv_dl = 1.0 / jnp.maximum(d_len, 1e-20)
        udx = dx * inv_dl
        udy = dy * inv_dl
        udz = dz * inv_dl
        ud_n = udx * nx_ + udy * ny_ + udz * nz_
        rfx = udx - 2.0 * ud_n * nx_
        rfy = udy - 2.0 * ud_n * ny_
        rfz = udz - 2.0 * ud_n * nz_
        mdx = rfx + aux_v * sx
        mdy = rfy + aux_v * sy
        mdz = rfz + aux_v * sz

        # Double-where: on non-dielectric winner lanes aux_v is fuzz (may
        # be 0) and the reciprocal branch would emit inf whose 0-cotangent
        # product is NaN in the vjp.
        aux_ok = jax.lax.stop_gradient(aux_v > 1e-10)
        ratio = jnp.where(c["front"],
                          1.0 / jnp.where(aux_ok, aux_v, 1.0), aux_v)
        cos_t = jnp.minimum(-ud_n, 1.0)
        rpx = ratio * (udx + cos_t * nx_)
        rpy = ratio * (udy + cos_t * ny_)
        rpz = ratio * (udz + cos_t * nz_)
        rpar_sq = 1.0 - (rpx * rpx + rpy * rpy + rpz * rpz)
        refr_ok = jax.lax.stop_gradient(rpar_sq > 1e-12)
        rlen = jnp.sqrt(jnp.where(refr_ok, rpar_sq, 1.0)) \
            * refr_ok.astype(jnp.float32)
        ddx = jnp.where(c["do_reflect"], rfx, rpx - rlen * nx_)
        ddy = jnp.where(c["do_reflect"], rfy, rpy - rlen * ny_)
        ddz = jnp.where(c["do_reflect"], rfz, rpz - rlen * nz_)

        ndx = jnp.where(c["is_lam"], ldx,
                        jnp.where(c["is_met"], mdx,
                                  jnp.where(c["is_die"], ddx, sx)))
        ndy = jnp.where(c["is_lam"], ldy,
                        jnp.where(c["is_met"], mdy,
                                  jnp.where(c["is_die"], ddy, sy)))
        ndz = jnp.where(c["is_lam"], ldz,
                        jnp.where(c["is_met"], mdz,
                                  jnp.where(c["is_die"], ddz, sz)))
        atr = jnp.where(c["is_die"], 1.0, albr)
        atg = jnp.where(c["is_die"], 1.0, albg)
        atb = jnp.where(c["is_die"], 1.0, albb)

        # --- contributions ------------------------------------------------
        inv_dl2 = jax.lax.rsqrt(jnp.maximum(a, 1e-20))
        tsky = 0.5 * (dy * inv_dl2 + 1.0)
        bgr = jnp.where(c["is_sky"],
                        (1.0 - tsky) * bg6[0] + tsky * bg6[3], bg6[0])
        bgg = jnp.where(c["is_sky"],
                        (1.0 - tsky) * bg6[1] + tsky * bg6[4], bg6[1])
        bgb = jnp.where(c["is_sky"],
                        (1.0 - tsky) * bg6[2] + tsky * bg6[5], bg6[2])
        missf = c["miss"].astype(jnp.float32)
        lightf = (c["hit"] & c["is_light"]).astype(jnp.float32)
        pex = pex + thx * (bgr * missf + albr * lightf)
        pey = pey + thy * (bgg * missf + albg * lightf)
        pez = pez + thz * (bgb * missf + albb * lightf)

        sv = c["survives"]
        ox2 = jnp.where(sv, px_, ox)
        oy2 = jnp.where(sv, py_, oy)
        oz2 = jnp.where(sv, pz_, oz)
        dx2 = jnp.where(sv, ndx, dx)
        dy2 = jnp.where(sv, ndy, dy)
        dz2 = jnp.where(sv, ndz, dz)
        if rr_depth:
            # Same op order as the kernel's RR block
            # (megakernel._one_bounce): post-attenuation throughput,
            # then the clamp. p is detached — see the docstring.
            tnx, tny, tnz = thx * atr, thy * atg, thz * atb
            p_rr = jnp.clip(jnp.maximum(tnx, jnp.maximum(tny, tnz)),
                            0.05, 1.0)
            inv_p = jnp.where(c["rr_on"],
                              1.0 / jax.lax.stop_gradient(p_rr), 1.0)
            thx2 = jnp.where(sv, tnx * inv_p, thx)
            thy2 = jnp.where(sv, tny * inv_p, thy)
            thz2 = jnp.where(sv, tnz * inv_p, thz)
        else:
            thx2 = jnp.where(sv, thx * atr, thx)
            thy2 = jnp.where(sv, thy * atg, thy)
            thz2 = jnp.where(sv, thz * atb, thz)
        return (ox2, oy2, oz2, dx2, dy2, dz2, time,
                thx2, thy2, thz2, pex, pey, pez)

    return g


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(state_ref, keys_ref, sph_ref, quad_ref, box_ref,
                atlas_ref, bg_ref,
                sb_ref, qb_ref, bb_ref, dso_ref, dsi_ref, dsph_ref,
                dquad_ref, dbox_ref,
                dbg_ref, datlas_ref, states_ref, *, k_steps, s_tiles,
                q_tiles, b_tiles, moving, has_quads, has_boxes,
                has_rot_boxes, has_perlin, has_images,
                img_ah, img_aw, t_min, max_depth, cull_s, cull_q,
                cull_b, fam_n=None, rr_depth=0):
    # Grad accumulators are revisited by every (sequential) grid step:
    # zero them once.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dsph_ref[:, :] = jnp.zeros(dsph_ref.shape, jnp.float32)
        dquad_ref[:, :] = jnp.zeros(dquad_ref.shape, jnp.float32)
        dbox_ref[:, :] = jnp.zeros(dbox_ref.shape, jnp.float32)
        datlas_ref[:, :] = jnp.zeros(datlas_ref.shape, jnp.float32)

    st = state_ref[:, :]
    tile_alive = jnp.any(st[14:15] > 0.5)

    @pl.when(jnp.logical_not(tile_alive))
    def _():
        # Dead tile: the chain was the identity, so the cotangent passes
        # straight through.
        dsi_ref[:, :] = dso_ref[:, :]
        dbg_ref[:, :] = jnp.zeros(dbg_ref.shape, jnp.float32)

    @pl.when(tile_alive)
    def _():
        _bwd_tile_body(st, keys_ref, sph_ref, quad_ref, box_ref,
                       atlas_ref,
                       bg_ref, dso_ref, dsi_ref, dsph_ref, dquad_ref,
                       dbox_ref,
                       dbg_ref, datlas_ref, states_ref, k_steps=k_steps,
                       s_tiles=s_tiles, q_tiles=q_tiles,
                       b_tiles=b_tiles, moving=moving,
                       has_quads=has_quads, has_boxes=has_boxes,
                       has_rot_boxes=has_rot_boxes,
                       has_perlin=has_perlin,
                       has_images=has_images, img_ah=img_ah,
                       img_aw=img_aw, t_min=t_min, max_depth=max_depth,
                       sb_ref=sb_ref, qb_ref=qb_ref, bb_ref=bb_ref,
                       cull_s=cull_s,
                       cull_q=cull_q, cull_b=cull_b, fam_n=fam_n,
                       rr_depth=rr_depth)


def _bwd_tile_body(st, keys_ref, sph_ref, quad_ref, box_ref, atlas_ref,
                   bg_ref,
                   dso_ref, dsi_ref, dsph_ref, dquad_ref, dbox_ref,
                   dbg_ref,
                   datlas_ref, states_ref, *, k_steps, s_tiles, q_tiles,
                   b_tiles,
                   moving, has_quads, has_boxes, has_rot_boxes,
                   has_perlin, has_images, img_ah,
                   img_aw, t_min, max_depth, sb_ref, qb_ref, bb_ref,
                   cull_s,
                   cull_q, cull_b, fam_n=None, rr_depth=0):
    k0 = keys_ref[0:1, :]
    k1 = keys_ref[1:2, :]
    bk = dict(s_tiles=s_tiles, q_tiles=q_tiles, moving=moving,
              has_quads=has_quads, has_perlin=has_perlin,
              has_images=has_images, img_ah=img_ah, img_aw=img_aw,
              n_media=0, t_min=t_min, max_depth=max_depth, sb_ref=sb_ref,
              qb_ref=qb_ref, cull_s=cull_s, cull_q=cull_q,
              box_ref=box_ref, b_tiles=b_tiles, has_boxes=has_boxes,
              has_rot_boxes=has_rot_boxes, bb_ref=bb_ref, cull_b=cull_b,
              fam_n=fam_n, rr_depth=rr_depth)

    # --- replay: fori_loop over the K steps (kernel size independent of
    # K), spilling each step's input state to a VMEM scratch so the
    # reverse sweep can re-derive the step's decisions. Once the tile is
    # fully dead the remaining steps cost one scalar branch each, and
    # n_live records how many steps actually ran — the reverse sweep
    # visits only those, so backward compute scales with the tile's
    # longest actual path, not with K.
    rows0 = mk._unpack_rows(st)
    # f32 alive row in the loop carry: an i1 vector carried through
    # scf.for trips a Mosaic roll/unroll layout bug.
    rows0_f = rows0[:14] + (rows0[14].astype(jnp.float32),) + rows0[15:]

    def replay_step(k, carry):
        rows_f, n_live = carry
        states_ref[pl.ds(pl.multiple_of(k * 16, 16), 16), :] = \
            jnp.concatenate(rows_f, axis=0)
        step_alive = jnp.any(rows_f[14] > 0.5)

        def live(rf):
            rows = rf[:14] + (rf[14] > 0.5,) + rf[15:]
            rows2, _ = mk._one_bounce(rows, k0, k1, sph_ref, quad_ref,
                                      None, atlas_ref, bg_ref, **bk)
            return rows2[:14] + (rows2[14].astype(jnp.float32),) \
                + rows2[15:]

        rows_f = jax.lax.cond(step_alive, live, lambda r: r, rows_f)
        return rows_f, n_live + step_alive.astype(jnp.int32)

    _, n_live = jax.lax.fori_loop(
        0, k_steps, replay_step, (rows0_f, jnp.zeros((), jnp.int32)))

    # --- reverse sweep over the n_live executed steps --------------------
    ds = dso_ref[:, :]
    bg6 = tuple(jnp.full((1, TN), bg_ref[i], jnp.float32)
                for i in range(6))
    is_sky = bg_ref[6] < 0.5
    atlas = atlas_ref[:, :] if has_images else None
    carry0 = tuple(ds[i:i + 1] for i in range(13)) \
        + tuple(jnp.zeros((1, TN), jnp.float32) for _ in range(6))
    if has_images:
        carry0 = carry0 + (jnp.zeros(atlas.shape, jnp.float32),)

    def rev_step(i, carry):
        k = k_steps - 1 - i
        st_k = states_ref[pl.ds(pl.multiple_of(k * 16, 16), 16), :]
        s_rows = mk._unpack_rows(st_k)
        _, aux = mk._one_bounce(s_rows, k0, k1, sph_ref, quad_ref, None,
                                atlas_ref, bg_ref, want_aux=True, **bk)
        sel_s = aux["sel_s"]
        sel_q = aux["sel_q"]
        mtype = sel_s[8:9]
        if has_boxes:
            sel_b = aux["sel_b"]
            mtype = jnp.where(aux["use_b"], sel_b[9:10], mtype)
        if has_quads:
            mtype = jnp.where(aux["use_q"], sel_q[14:15], mtype)
        consts = dict(
            t_hit=aux["t_hit"], use_q=aux["use_q"], hit=aux["hit"],
            miss=aux["miss"], survives=aux["survives"],
            front=aux["front"], degen=aux["degen"],
            do_reflect=aux["do_reflect"], use_c2=aux["use_c2"],
            draws=aux["draws"], is_sky=is_sky,
            is_lam=mtype == MAT_LAMBERTIAN,
            is_met=mtype == MAT_METAL,
            is_die=mtype == MAT_DIELECTRIC,
            is_light=mtype == MAT_DIFFUSE_LIGHT)
        if has_boxes:
            consts["use_b"] = aux["use_b"]
        if has_perlin:
            consts["is_per"] = aux["is_per"]
        if has_images:
            consts["is_img"] = aux["is_img"]
            consts["xi"] = aux["xi"]
            consts["img_row"] = aux["img_row"]
        if rr_depth:
            # Bounce row (f32) of the step's input state — same compare
            # as the kernel's RR block.
            consts["rr_on"] = s_rows[13] >= jnp.float32(rr_depth)

        g = _make_diff_step(consts, moving=moving, has_quads=has_quads,
                            has_boxes=has_boxes,
                            has_rot_boxes=has_rot_boxes,
                            has_perlin=has_perlin, has_images=has_images,
                            img_ah=img_ah, img_aw=img_aw,
                            rr_depth=rr_depth)
        diff_ins = list(s_rows[:13]) + [sel_s]
        if has_quads:
            diff_ins.append(sel_q)
        if has_boxes:
            diff_ins.append(sel_b)
        diff_ins += list(bg6)
        if has_images:
            diff_ins.append(atlas)

        _, vjp_fn = jax.vjp(g, *diff_ins)
        grads = vjp_fn(tuple(carry[:13]))

        d_cont = tuple(grads[:13])
        d_sel_s = grads[13]
        gi = 14
        if has_quads:
            d_sel_q = grads[gi]
            gi += 1
        if has_boxes:
            d_sel_b = grads[gi]
            gi += 1
        dbg_new = tuple(carry[13 + ci] + grads[gi + ci]
                        for ci in range(6))
        gi += 6
        out = d_cont + dbg_new
        if has_images:
            out = out + (carry[19] + grads[gi],)

        # Winner-attribute cotangent -> primitive pack: the transpose of
        # the forward's one-hot selection, one MXU contraction per tile.
        win_s = aux["win_s"].astype(jnp.int32)

        s_w = mk._fam_width(dsph_ref.shape[1])

        def scat_s(si, _):
            off = pl.multiple_of(si * s_w, s_w)
            rows_iota = jax.lax.broadcasted_iota(jnp.int32, (s_w, TN), 0)
            oh = (rows_iota == (win_s - si * s_w)).astype(jnp.float32)
            dsph_ref[:, pl.ds(off, s_w)] += mk._onehot_dot(
                d_sel_s, oh, (((1,), (1,)), ((), ())))
            return 0

        jax.lax.fori_loop(0, s_tiles, scat_s, 0)

        if has_quads:
            win_q = aux["win_q"].astype(jnp.int32)

            q_w = mk._fam_width(dquad_ref.shape[1])

            def scat_q(qi, _):
                off = pl.multiple_of(qi * q_w, q_w)
                rows_iota = jax.lax.broadcasted_iota(jnp.int32,
                                                     (q_w, TN), 0)
                oh = (rows_iota == (win_q - qi * q_w)).astype(jnp.float32)
                dquad_ref[:, pl.ds(off, q_w)] += mk._onehot_dot(
                    d_sel_q, oh, (((1,), (1,)), ((), ())))
                return 0

            jax.lax.fori_loop(0, q_tiles, scat_q, 0)

        if has_boxes:
            win_b = aux["win_b"].astype(jnp.int32)

            b_w = mk._fam_width(dbox_ref.shape[1])

            def scat_b(bi, _):
                off = pl.multiple_of(bi * b_w, b_w)
                rows_iota = jax.lax.broadcasted_iota(jnp.int32,
                                                     (b_w, TN), 0)
                oh = (rows_iota == (win_b - bi * b_w)).astype(jnp.float32)
                dbox_ref[:, pl.ds(off, b_w)] += mk._onehot_dot(
                    d_sel_b, oh, (((1,), (1,)), ((), ())))
                return 0

            jax.lax.fori_loop(0, b_tiles, scat_b, 0)
        return out

    carry = jax.lax.fori_loop(k_steps - n_live, k_steps, rev_step, carry0)

    if has_images:
        datlas_ref[:, :] += carry[19]

    zeros3 = jnp.zeros((3, TN), jnp.float32)
    dsi_ref[:, :] = jnp.concatenate(list(carry[:13]) + [zeros3], axis=0)
    dbg_ref[:, :] = jnp.concatenate(
        list(carry[13:19]) + [jnp.zeros((2, TN), jnp.float32)], axis=0)


def _bwd_call(state, keys, sph24, quad24, box24, bg8, atlas, sb, qb, bb,
              d_out, *,
              k_steps, moving, has_quads, has_boxes, has_rot_boxes,
              has_perlin, has_images,
              img_ah, img_aw, t_min, max_depth, fam_n=None, rr_depth=0):
    q = state.shape[1]
    s_count = sph24.shape[1]
    q_count = quad24.shape[1]
    b_count = box24.shape[1]
    cull_s = mk._fam_tiles(s_count) >= mk.CULL_MIN_TILES
    cull_q = has_quads and mk._fam_tiles(q_count) >= mk.CULL_MIN_TILES
    cull_b = has_boxes and mk._fam_tiles(b_count) >= mk.CULL_MIN_TILES

    kern = functools.partial(
        _bwd_kernel, k_steps=k_steps, s_tiles=mk._fam_tiles(s_count),
        q_tiles=mk._fam_tiles(q_count),
        b_tiles=mk._fam_tiles(b_count), moving=moving,
        has_quads=has_quads, has_boxes=has_boxes,
        has_rot_boxes=has_rot_boxes,
        has_perlin=has_perlin, has_images=has_images, img_ah=img_ah,
        img_aw=img_aw, t_min=t_min, max_depth=float(max_depth),
        cull_s=cull_s, cull_q=cull_q, cull_b=cull_b, fam_n=fam_n,
        rr_depth=rr_depth)

    grid = (q // TN,)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    out = mk.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            acc((24, s_count)),
            acc((24, q_count)),
            acc((24, b_count)),
            acc(atlas.shape),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((16, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            acc((24, s_count)),
            acc((24, q_count)),
            acc((24, b_count)),
            pl.BlockSpec((8, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            acc(atlas.shape),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, q), jnp.float32),
            jax.ShapeDtypeStruct((24, s_count), jnp.float32),
            jax.ShapeDtypeStruct((24, q_count), jnp.float32),
            jax.ShapeDtypeStruct((24, b_count), jnp.float32),
            jax.ShapeDtypeStruct((8, q), jnp.float32),
            jax.ShapeDtypeStruct(atlas.shape, jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((k_steps * 16, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * k_steps * 40 * q * (s_count + q_count + b_count),
            bytes_accessed=4 * (4 * 16 * q + 2 * q
                                + 4 * 24 * (s_count + q_count
                                            + b_count)),
            transcendentals=3 * k_steps * q * 40),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=mk._VMEM_LIMIT),
    )(state, keys, sph24, quad24, box24, atlas, bg8, sb, qb, bb, d_out)
    return out


# ---------------------------------------------------------------------------
# custom_vjp chain
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def bounce_chain(k_steps: int, moving: bool, has_quads: bool,
                 has_perlin: bool, has_images: bool, img_ah: int,
                 img_aw: int, max_depth: int, t_min: float,
                 has_boxes: bool = False, has_rot_boxes: bool = False,
                 fam_n=None, rr_depth: int = 0):
    """K fused bounce steps as a reverse-differentiable primitive.

    Returns chain(state, keys, sph24, quad24, box24, bg8, atlas, sb,
    qb, bb) -> state'.
    Forward = the forward megakernel; backward = one replay+adjoint
    Pallas launch. Residuals are just the chain's inputs, so scanning
    the chain gives per-K-bounce checkpointing for free."""

    kwargs = dict(k_steps=k_steps, moving=moving, has_quads=has_quads,
                  has_boxes=has_boxes, has_rot_boxes=has_rot_boxes,
                  has_perlin=has_perlin, has_images=has_images,
                  img_ah=img_ah, img_aw=img_aw, t_min=t_min,
                  max_depth=max_depth, fam_n=fam_n, rr_depth=rr_depth)

    @jax.custom_vjp
    def chain(state, keys, sph24, quad24, box24, bg8, atlas, sb, qb, bb):
        med24 = jnp.zeros((8, 24), jnp.float32)
        return mk.bounce_steps(state, keys, sph24, quad24, med24, bg8,
                               atlas, sb, qb, box24, bb, n_media=0,
                               **kwargs)

    def fwd(state, keys, sph24, quad24, box24, bg8, atlas, sb, qb, bb):
        out = chain(state, keys, sph24, quad24, box24, bg8, atlas, sb,
                    qb, bb)
        return out, (state, keys, sph24, quad24, box24, bg8, atlas, sb,
                     qb, bb)

    def bwd(res, d_out):
        state, keys, sph24, quad24, box24, bg8, atlas, sb, qb, bb = res
        dsi, dsph, dquad, dbox, dbg_lanes, datlas = _bwd_call(
            state, keys, sph24, quad24, box24, bg8, atlas, sb, qb, bb,
            d_out, **kwargs)
        d_bg8 = jnp.sum(dbg_lanes, axis=1)
        d_keys = np.zeros(keys.shape, jax.dtypes.float0)
        return (dsi, d_keys, dsph, dquad, dbox, d_bg8, datlas,
                jnp.zeros_like(sb), jnp.zeros_like(qb),
                jnp.zeros_like(bb))

    chain.defvjp(fwd, bwd)
    return chain
