"""Independent brute-force numpy oracle for the Blinn path-tracing integrator.

Re-implements the reference semantics (MtlBlinn::Shade, MtlBlinn.cpp:89-138
and its helpers; light selection :309-315; refraction chain :437-589; combine
clamps :117-131) directly in numpy, level-synchronously, with NO shared code
with bhraytracer_tpu.models.pathtracer. The only things shared with the
production renderer are (a) the threefry uniform tables (drawn through
jax.random with the same keys — the RNG is not under test) and (b) the
refraction-slot compaction bookkeeping (stable argsort order), so results are
comparable lane-for-lane. Everything numeric — intersection, transforms,
Fresnel, sampling transforms, clamps, combine — is written here from the
reference's description (SURVEY.md §2 C4/C6/C8) and must AGREE with the
production renderer without being copied from it.

Analytic primitives only (sphere/plane); no meshes, no textures (the parity
scenes are untextured). Colors are float64 numpy for a sharper oracle.
"""

from __future__ import annotations

import numpy as np

BIG = 1.0e30
NAN_PURPLE = np.array([1.0, 0.0, 1.0])


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def _sphere_hit(o, d, side):
    """Unit sphere; o, d scalars (3,). Returns (t, front) or (BIG, True)."""
    a = d @ d
    b = 2.0 * (d @ o)
    c = o @ o - 1.0
    disc = b * b - 4.0 * a * c
    if disc <= 0.0:
        return BIG, True
    sq = np.sqrt(disc)
    t2 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    if side == "front":
        t, front = (t2, True) if t2 > 0.0 else (BIG, True)
    else:  # both
        if t2 > 0.0:
            t, front = t2, True
        elif t1 * t2 <= 0.0:
            t, front = t1, False
        else:
            t, front = BIG, True
    if t <= 0.0 or t >= BIG:
        return BIG, True
    return t, front


def _plane_hit(o, d, side):
    dz = d[2]
    if dz == 0.0:
        return BIG, True
    t = -o[2] / dz
    if t <= 0.0:
        return BIG, True
    x = o[0] + t * d[0]
    y = o[1] + t * d[1]
    if abs(x) > 1.0 or abs(y) > 1.0:
        return BIG, True
    front = dz < 0.0
    if side == "front" and not front:
        return BIG, True
    return t, front


class OracleScene:
    """Plain-python mirror of the analytic part of a ScenePack."""

    def __init__(self, pack):
        g = lambda x: np.asarray(x, np.float64)
        self.sph = [
            (g(pack.sph_itm[i]), g(pack.sph_tm[i]), g(pack.sph_pos[i]),
             int(pack.sph_mtl[i]))
            for i in range(pack.n_sph)
        ]
        self.pln = [
            (g(pack.pln_itm[i]), g(pack.pln_tm[i]), g(pack.pln_pos[i]),
             int(pack.pln_mtl[i]))
            for i in range(pack.n_pln)
        ]
        self.mtl = {
            k: g(getattr(pack, "mtl_" + k))
            for k in ("diffuse", "specular", "gloss", "refraction",
                      "refr_gloss", "ior", "absorption")
        }
        self.light_kind = np.asarray(pack.light_kind)
        self.light_intensity = g(pack.light_intensity)
        self.light_vec = g(pack.light_vec)
        self.light_size = g(pack.light_size)
        self.bg = g(pack.bg_color)
        self.env = g(pack.env_color)

    # --- tracing ---

    def closest(self, o, d, side):
        """Returns (t, kind, idx, front) with kind in {none,sphere,plane}."""
        best = (BIG, "none", -1, True)
        for i, (itm, _tm, pos, _m) in enumerate(self.sph):
            t, front = _sphere_hit(itm @ (o - pos), itm @ d, side)
            if t < best[0]:
                best = (t, "sphere", i, front)
        for i, (itm, _tm, pos, _m) in enumerate(self.pln):
            t, front = _plane_hit(itm @ (o - pos), itm @ d, side)
            if t < best[0]:
                best = (t, "plane", i, front)
        return best

    def resolve(self, o, d, t, kind, idx):
        """World hit point, shading normal (unflipped), material id."""
        if kind == "sphere":
            itm, tm, pos, m = self.sph[idx]
        else:
            itm, tm, pos, m = self.pln[idx]
        ol = itm @ (o - pos)
        dl = itm @ d
        pl = ol + t * dl
        nl = pl if kind == "sphere" else np.array([0.0, 0.0, 1.0])
        pw = tm @ pl + pos
        nw = itm.T @ nl
        nw = nw / max(np.linalg.norm(nw), 1e-30)
        return pw, nw, m

    def shadow(self, o, d, t_max, bias):
        """Any-hit: sphere front-entry or plane in (bias, t_max)."""
        for itm, _tm, pos, _m in self.sph:
            ol, dl = itm @ (o - pos), itm @ d
            a, b, c = dl @ dl, 2.0 * (dl @ ol), ol @ ol - 1.0
            disc = b * b - 4.0 * a * c
            if disc > 0.0:
                tmin = (-b - np.sqrt(disc)) / (2.0 * a)
                if bias < tmin < t_max:
                    return True
        for itm, _tm, pos, _m in self.pln:
            ol, dl = itm @ (o - pos), itm @ d
            if dl[2] != 0.0:
                t = -ol[2] / dl[2]
                x = ol + t * dl
                if (t >= 0.0 and abs(x[0]) <= 1.0 and abs(x[1]) <= 1.0
                        and bias < t < t_max):
                    return True
        return False


# ---------------------------------------------------------------------------
# sampling transforms (MtlBlinn.cpp:591-716) — independent numpy versions
# ---------------------------------------------------------------------------


def _crossing(v):
    z = np.array([0.0, 0.0, 1.0])
    c = np.cross(v, z)
    if c @ c < 1e-12:
        return np.array([1.0, 0.0, 0.0])
    return z


def _frame(n):
    a1 = np.cross(_crossing(n), n)
    a1 = a1 / max(np.linalg.norm(a1), 1e-30)
    a2 = np.cross(a1, n)
    a2 = a2 / max(np.linalg.norm(a2), 1e-30)
    return a1, a2


def _along_normal(n, radius, u1, u2):
    r = np.sqrt(u1) * radius
    th = u2 * 2.0 * np.pi
    a1, a2 = _frame(n)
    return n + a1 * (r * np.cos(th)) + a2 * (r * np.sin(th))


def _along_dir(n, gloss, u1, u2):
    theta = np.arccos(np.clip(np.power(max(u1, 1e-12), 1.0 / (gloss + 1.0)), -1, 1))
    r = np.tan(theta)
    phi = u2 * 2.0 * np.pi
    a1, a2 = _frame(n)
    return n + a1 * (r * np.cos(phi)) + a2 * (r * np.sin(phi)), theta


def _in_semisphere(n, u1, u2):
    a_y = np.cross(n, _crossing(n))
    a_y = a_y / max(np.linalg.norm(a_y), 1e-30)
    a_x = np.cross(n, a_y)
    phi = u1 * 2.0 * np.pi
    theta = 0.5 * np.arccos(np.clip(1.0 - 2.0 * u2, -1.0, 1.0))
    st = np.sin(theta)
    d = st * np.cos(phi) * a_x + st * np.sin(phi) * a_y + np.cos(theta) * n
    return d, theta


def _norm(v):
    return v / max(np.linalg.norm(v), 1e-30)


def _env_sample(scene, d):
    """SampleEnvironment validity rules (scene.h:414-420)."""
    dx, dy, dz = d
    denom = abs(dx) + abs(dy)
    if abs(dz) > 1.0 or denom <= 0.0:
        return np.zeros(3), False
    return scene.env.copy(), True


# ---------------------------------------------------------------------------
# the oracle integrator
# ---------------------------------------------------------------------------


class Oracle:
    """Level-synchronous numpy integrator over the whole (small) chunk.

    Mirrors the wavefront's tree structure and uniform-table indexing so the
    result is lane-for-lane comparable with trace_radiance."""

    def __init__(self, pack, cfg, key):
        import jax

        self.scene = OracleScene(pack)
        self.cfg = cfg
        self.key = key
        self._jax = jax

    def _uniform_tables(self, n_levels, level_sizes):
        """Draw the same threefry tables _shade_level consumes."""
        import jax

        key = self.key
        tabs = []
        for lvl in range(n_levels):
            lk = jax.random.fold_in(key, 100 + lvl)
            u_tab = np.asarray(
                jax.random.uniform(jax.random.fold_in(lk, 1),
                                   (level_sizes[lvl], 13)), np.float64)
            tabs.append({"u": u_tab, "chain_key": jax.random.fold_in(lk, 2)})
        return tabs

    def radiance(self, o, d, bg_uv=None):
        """Radiance for camera rays o, d: (N,3) numpy. Returns (N,3)."""
        cfg = self.cfg
        n0 = o.shape[0]
        sizes = cfg.level_sizes(n0)
        tabs = self._uniform_tables(cfg.max_levels, sizes)

        # forward sweep: build per-level task arrays
        levels = []
        tasks = [{"o": o[i].astype(np.float64), "d": d[i].astype(np.float64),
                  "active": True, "bounce": cfg.tir_bounces}
                 for i in range(n0)]
        for lvl in range(cfg.max_levels):
            rec, children = self._shade_level(lvl, tasks, tabs[lvl])
            levels.append((rec, tasks))
            tasks = children

        # backward combine
        m = len(tasks)
        child = [{"rad": np.zeros(3), "z": BIG, "hit": False} for _ in range(m)]
        for lvl in reversed(range(cfg.max_levels)):
            rec, tasks_l = levels[lvl]
            child = self._combine(lvl, rec, child)
        out = np.zeros((n0, 3))
        for i in range(n0):
            out[i] = child[i]["rad"] if child[i]["hit"] else self._bg(bg_uv, i)
        return out

    def _bg(self, bg_uv, i):
        return self.scene.bg.copy()

    # --- one level, one lane at a time (clarity over speed) ---

    def _shade_level(self, lvl, tasks, tab):
        import jax

        cfg = self.cfg
        scene = self.scene
        n = len(tasks)
        u = tab["u"]
        gi_on = cfg.gi_active(lvl)

        recs = []
        hits = []
        for i, tk in enumerate(tasks):
            if not tk["active"]:
                recs.append(None)
                hits.append(None)
                continue
            t, kind, idx, front = scene.closest(tk["o"], tk["d"], "front")
            if t >= BIG:
                recs.append({"hit": False, "z": BIG})
                hits.append(None)
                continue
            p, nrm, mid = scene.resolve(tk["o"], tk["d"], t, kind, idx)
            hits.append((t, kind, idx, front, p, nrm, mid))
            recs.append({"hit": True, "z": t})

        # refraction candidates + compacted slots (stable order, same rule)
        cand = np.zeros(n, bool)
        for i, tk in enumerate(tasks):
            if hits[i] is None:
                continue
            mid = hits[i][6]
            refr = scene.mtl["refraction"][mid]
            ior = scene.mtl["ior"][mid]
            vv = _norm(tk["o"] - hits[i][4])
            cos1 = np.clip(hits[i][5] @ vv, 0.0, 1.0)
            r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
            fres = r0 + (1.0 - r0) * (1.0 - cos1) ** 5
            refr_eff = (1.0 - fres) * refr
            cand[i] = np.any(refr_eff != 0.0) and tk["bounce"] > 0
        k_cap = cfg.refr_cap(n)
        order = np.argsort(~cand, kind="stable")
        sel = order[:k_cap]
        slot_of = {int(lane): s for s, lane in enumerate(sel) if cand[lane]}

        gi_children = [None] * n
        refr_children = [None] * k_cap

        for i, tk in enumerate(tasks):
            rec = recs[i]
            if rec is None or not rec["hit"]:
                if rec is not None:
                    rec.update(direct=np.zeros(3), gi_albedo=np.zeros(3),
                               gi_env=np.zeros(3), refr_slot=-1)
                continue
            t, kind, idx, front, p, nrm, mid = hits[i]
            vv = _norm(tk["o"] - p)
            vn = nrm
            cos1 = np.clip(vn @ vv, 0.0, 1.0)
            mtl = {k: scene.mtl[k][mid] for k in scene.mtl}

            # Schlick fold (MtlBlinn.cpp:107-114)
            r0 = ((1.0 - mtl["ior"]) / (1.0 + mtl["ior"])) ** 2
            fres = r0 + (1.0 - r0) * (1.0 - cos1) ** 5
            spec = np.minimum(mtl["specular"] + fres * mtl["refraction"], 1.0)
            refr_eff = (1.0 - fres) * mtl["refraction"]

            rec["direct"] = self._direct(i, p, vn, vv, mtl, spec, u[i])
            if gi_on:
                gi_o, gi_d, alb, env = self._gi(p, vn, vv, mtl, spec, u[i, 8:13])
                rec["gi_albedo"] = alb
                rec["gi_env"] = env
                gi_children[i] = {"o": gi_o, "d": gi_d, "active": True,
                                  "bounce": tk["bounce"]}
            else:
                rec["gi_albedo"] = np.zeros(3)
                rec["gi_env"] = np.zeros(3)

            if i in slot_of:
                s = slot_of[i]
                rec["refr_slot"] = s
                refr_children[s] = self._refraction(
                    i, s, p, vn, vv, cos1, mtl, refr_eff, tk["bounce"],
                    tab["chain_key"], k_cap)
            else:
                rec["refr_slot"] = -1

        # children layout: [gi (n)] ++ [refr (k_cap)] (or refr only)
        children = []
        if gi_on:
            for i in range(n):
                c = gi_children[i]
                children.append(c if c is not None else
                                {"o": np.zeros(3), "d": np.array([0.0, 0.0, 1.0]),
                                 "active": False, "bounce": 0})
        for s in range(k_cap):
            c = refr_children[s]
            if c is None or c.get("case") not in ("front", "out"):
                children.append({"o": np.zeros(3), "d": np.array([0.0, 0.0, 1.0]),
                                 "active": False, "bounce": 0})
            else:
                children.append({"o": c["o"], "d": c["d"], "active": True,
                                 "bounce": c["bounce"]})
        self._last_refr = refr_children
        self._last_gi_on = gi_on
        self._last_recs = recs
        self._recs_by_level = getattr(self, "_recs_by_level", {})
        self._recs_by_level[lvl] = (recs, refr_children, gi_on, n, k_cap)
        return (recs, refr_children, gi_on, n, k_cap), children

    def _direct(self, i, p, vn, vv, mtl, spec_color, u):
        scene = self.scene
        cfg = self.cfg
        # light selection walk (MtlBlinn.cpp:309-315): individual share > u
        gray = scene.light_intensity.sum(axis=1) / 3.0
        total = max(gray.sum(), 1e-30)
        probs = gray / total
        li = len(probs) - 1
        for k in range(len(probs)):
            if u[7] <= probs[k]:
                li = k
                break
        kind = int(scene.light_kind[li])
        lvec = scene.light_vec[li]
        lsize = scene.light_size[li]
        inten = scene.light_intensity[li]

        # sample direction vL (GetSampleInLight)
        if kind == 2:
            kd = mtl["diffuse"].max()
            ks = spec_color.max()
            vl_c = lvec - p
            d_vl, d_theta = _along_dir(_norm(vl_c), mtl["gloss"], u[0], u[1])
            p_diffuse = (np.cos(d_theta) ** mtl["gloss"]
                         if np.cos(d_theta) > 0 else 0.0)
            r = u[2]
            big_r = np.sqrt(r) * lsize
            th = u[3] * 2.0 * np.pi
            a1 = _norm(np.cross(_crossing(vl_c), vl_c))
            a2 = _norm(np.cross(a1, vl_c))
            s_vl = vl_c + a1 * big_r * np.cos(th) + a2 * big_r * np.sin(th)
            p_specular = 2.0 * r / max(big_r * big_r, 1e-30)
            pd = kd * p_diffuse
            ps = ks * p_specular
            pd_norm = pd / (pd + ps) if abs(pd + ps) >= 1e-30 else pd / 1e-30
            use_spec = u[4] >= pd_norm
            if ks == 0 and kd != 0:
                use_spec = False
            if ks != 0 and kd == 0:
                use_spec = True
            vl = _norm(s_vl) if use_spec else _norm(d_vl)
        elif kind == 1:
            vl = -_norm(lvec)
        else:
            vl = np.zeros(3)

        cos_theta = vl @ vn
        # irradiance with one shadow ray (Illuminate)
        mask = cos_theta > 0
        if kind == 2:
            center = lvec - p
            rr = center @ center
            sdir = _along_normal(center, lsize, u[5], u[6]) if lsize > 0 else center
            occ = scene.shadow(p, sdir, 1.0, cfg.shadow_bias) if mask else False
            vis = 0.0 if (occ and mask) else 1.0
            irr = inten * vis / max(rr, 1e-30) if rr != 0.0 else np.full(3, BIG)
        elif kind == 1:
            occ = scene.shadow(p, -lvec, BIG, cfg.shadow_bias) if mask else False
            vis = 0.0 if (occ and mask) else 1.0
            irr = inten * vis
        else:
            irr = inten

        vh = _norm(vl + vv)
        hn = max(vh @ vn, 0.0)
        brdf_cos = (mtl["diffuse"] * cos_theta
                    + spec_color * (hn ** mtl["gloss"] if hn > 0 else 0.0))
        out = irr * brdf_cos if cos_theta > 0 else np.zeros(3)
        out = np.minimum(out, 1.0)
        if np.isnan(out[0]):
            out = np.zeros(3)
        return out

    def _gi(self, p, vn, vv, mtl, spec_color, u):
        cfg = self.cfg
        kd = mtl["diffuse"].max()
        ks = spec_color.max()
        d_dir, d_theta = _in_semisphere(vn, u[0], u[1])
        d_dir = _norm(d_dir)
        p_dt = np.sin(2.0 * d_theta)
        vr = 2.0 * (vn @ vv) * vn - vv
        s_dir, s_theta = _along_dir(vr, mtl["gloss"], u[2], u[3])
        p_st = np.cos(s_theta) ** mtl["gloss"] if np.cos(s_theta) > 0 else 0.0
        denom = kd * p_dt + ks * p_st
        pd_norm = (kd * p_dt) / denom if abs(denom) >= 1e-30 else (kd * p_dt) / 1e-30
        use_spec = u[4] >= pd_norm
        gi_dir = s_dir if use_spec else d_dir
        gi_o = p + vn * cfg.bias
        albedo = spec_color if use_spec else mtl["diffuse"]
        env, valid = _env_sample(self.scene, gi_dir)
        env_term = env * albedo if valid else np.zeros(3)
        if gi_dir[0] == gi_dir[1] and gi_dir[0] == 0.0:
            env_term = NAN_PURPLE.copy()
        return gi_o, gi_dir, albedo, env_term

    def _refraction(self, lane, slot, p, vn, vv, cos1, mtl, refr_eff, bounce,
                    chain_key, k_cap):
        """Entry + TIR loop + exit (MtlBlinn.cpp:437-589). IMPORTANT: glossy
        per-lane uniforms index by compacted SLOT, matching the wavefront."""
        import jax

        cfg = self.cfg
        scene = self.scene

        # NOTE on RNG: _glossy_refr_dir draws (k_cap,)-shaped tables; lane j
        # of the compacted batch reads element j. We reproduce by drawing the
        # same tables and indexing with `slot`.
        def table_u(key, tag):
            return float(np.asarray(
                jax.random.uniform(jax.random.fold_in(key, tag), (k_cap,))
            )[slot])

        sin1 = np.sqrt(max(1.0 - cos1 * cos1, 0.0))
        sin2 = sin1 / max(mtl["ior"], 1e-6)
        cos2 = np.sqrt(max(1.0 - sin2 * sin2, 1e-24))
        vtn = -cos2 * vn
        vnxv = np.cross(vn, vv)
        vtp = _norm(np.cross(vn, vnxv)) * sin2
        vt = vtn + vtp
        rgloss = mtl["gloss"] if mtl["gloss"] > 50.0 else 0.0

        # entry glossy resample (tags 20+2k on the level chain key)
        if rgloss > 0.0:
            chosen, found = _norm(vt), False
            for k in range(cfg.refr_gloss_tries):
                u1 = table_u(chain_key, 20 + 2 * k)
                u2 = table_u(chain_key, 20 + 2 * k + 1)
                cand, _ = _along_dir(vt, rgloss, u1, u2)
                if (cand @ vn) < 0.0 and not found:
                    chosen, found = _norm(cand), True
            vt = chosen if found else _norm(vt)
        else:
            vt = _norm(vt)

        state_p, state_n, state_d = p.copy(), vn.copy(), vt
        it = 0
        while True:
            ray_o = state_p - state_n * cfg.bias
            ray_d = state_d
            t, kind, idx, front = scene.closest(ray_o, ray_d, "both")
            if t >= BIG:
                return {"case": "miss", "slot": slot}
            ph, nh, mid2 = scene.resolve(ray_o, ray_d, t, kind, idx)
            if front:
                return {"case": "front", "o": ray_o, "d": ray_d,
                        "bounce": bounce, "slot": slot,
                        "mult": np.ones(3), "absorb": np.zeros(3)}
            # back face: exit or TIR
            vn2 = nh
            vv2 = -_norm(ray_d)
            c1 = vv2 @ (-vn2)
            s1 = np.sqrt(max(1.0 - c1 * c1, 0.0))
            s2 = mtl["ior"] * s1
            if s2 <= 1.0:
                c2 = np.sqrt(max(1.0 - s2 * s2, 1e-24))
                vt2 = vn2 * c2 + _norm(np.cross(vn2, np.cross(vn2, vv2))) * s2
                if rgloss > 0.0:
                    kk = jax.random.fold_in(chain_key, 40)
                    kk = jax.random.fold_in(kk, it)
                    chosen, found = _norm(vt2), False
                    for k in range(cfg.refr_gloss_tries):
                        u1 = table_u(kk, 2 * k)
                        u2 = table_u(kk, 2 * k + 1)
                        cand, _ = _along_dir(vt2, rgloss, u1, u2)
                        if (cand @ vn2) > 0.0 and not found:
                            chosen, found = _norm(cand), True
                    vt2 = chosen if found else _norm(vt2)
                else:
                    vt2 = _norm(vt2)
                return {"case": "out", "o": ph + vn2 * cfg.bias, "d": vt2,
                        "bounce": bounce, "slot": slot,
                        "mult": refr_eff.copy(), "absorb": mtl["absorption"].copy()}
            if bounce <= 0:
                return {"case": "none", "slot": slot}
            # TIR
            state_p, state_n = ph, vn2
            state_d = -2.0 * c1 * vn2 - vv2
            bounce -= 1
            it += 1

    def _combine(self, lvl, rec_pack, child):
        cfg = self.cfg
        recs, refr_children, gi_on, n, k_cap = rec_pack
        if gi_on:
            gi_child = child[:n]
            refr_child = child[n:]
        else:
            refr_child = child
        out = []
        for i in range(n):
            rec = recs[i]
            if rec is None or not rec.get("hit", False):
                out.append({"rad": np.zeros(3), "z": BIG if rec is None else rec["z"],
                            "hit": False if rec is None else rec["hit"]})
                continue
            # refraction term
            s = rec["refr_slot"]
            refr = np.zeros(3)
            if s >= 0:
                rc = refr_children[s]
                if rc is not None and rc.get("case") in ("front", "out"):
                    c0 = refr_child[s]
                    mult = rc["mult"] if rc["case"] == "out" else np.ones(3)
                    absorb_c = rc["absorb"] if rc["case"] == "out" else np.zeros(3)
                    if c0["hit"]:
                        absorb = np.exp(-absorb_c * c0["z"])
                        refr = np.minimum(mult * absorb * c0["rad"], 1.0)
                    else:
                        env, valid = _env_sample(self.scene, rc["d"])
                        refr = np.minimum(mult * env if valid else np.zeros(3), 1.0)
                elif rc is not None and rc.get("case") == "miss":
                    refr = np.minimum(NAN_PURPLE.copy(), 1.0)
                # case none -> black
            rad = refr.copy()
            sat = np.all(rad >= 1.0)
            if gi_on:
                gc = gi_child[i]
                if gc["hit"] and gc["z"] > cfg.bias:
                    gi = gc["rad"] * rec["gi_albedo"]
                elif gc["hit"]:
                    gi = np.zeros(3)
                else:
                    gi = rec["gi_env"]
                if np.isnan(gi[0]):
                    gi = NAN_PURPLE.copy()
                gi = np.minimum(gi, 1.0)
                if not sat:
                    rad = rad + gi
                sat = np.all(rad >= 1.0)
            if not sat:
                rad = rad + rec["direct"]
            if np.isnan(rad[0]):
                rad = NAN_PURPLE.copy()
            out.append({"rad": rad, "z": rec["z"], "hit": True})
        return out


def oracle_camera_rays(cam, width, height, px, py, key):
    """Primary rays with the same jitter uniforms as _stage_raygen."""
    import jax

    u = np.asarray(jax.random.uniform(jax.random.fold_in(key, 0),
                                      (len(px), 2)), np.float64)
    pos = np.asarray(cam.pos, np.float64)
    dirv = np.asarray(cam.dir, np.float64)
    up = np.asarray(cam.up, np.float64)
    aor = width / float(height)
    tan_h = np.tan(float(cam.fov) / 2.0 * 3.14159265 / 180.0)
    ell = float(cam.focaldist)
    h = 2.0 * ell * tan_h
    w = aor * h
    cam_z = -dirv
    cam_y = up
    cam_x = np.cross(cam_y, cam_z)
    top_left = pos - cam_z * ell + cam_y * (h / 2.0) - cam_x * (w / 2.0)
    dd_x = cam_x * (w / width)
    dd_y = cam_y * (h / height)
    pixel_len = np.linalg.norm(dd_x)
    o = np.zeros((len(px), 3))
    d = np.zeros((len(px), 3))
    for i in range(len(px)):
        center = top_left + px[i] * dd_x - py[i] * dd_y
        jitter = (dd_x / pixel_len * ((u[i, 0] * 2.0 - 1.0) * pixel_len / 2.0)
                  + dd_y / np.linalg.norm(dd_y) * ((u[i, 1] * 2.0 - 1.0) * pixel_len / 2.0))
        o[i] = pos
        d[i] = center + jitter - pos
    return o, d
