"""Quantities: entropies, entanglement measures, fidelities, measurement.

Re-design of reference ``quimb/calc.py`` (entropy :423, mutinf :486,
logneg :751, concurrence :879, quantum_discord :951, fidelity :53,
measure :246, simulate_counts :328, pauli_decomp, heisenberg_energy,
page_entropy, is_degenerate...). All spectral work runs on device via
``jnp.linalg.eigh``; measurement sampling uses host RNG over device-
computed probabilities.
"""

import functools
import itertools
import math
import numbers

import jax
import jax.numpy as jnp
import numpy as np

from .core import (
    dag,
    dop,
    expectation,
    isket,
    isop,
    isvec,
    kron,
    partial_trace,
    prod,
    ptr,
    qu,
)
from .linalg.base_linalg import eigh, eigvalsh, norm, sqrtm


def fidelity(p1, p2, squared=False):
    """Fidelity between two states (reference calc.py:53)."""
    if isvec(p1) or isvec(p2):
        if isvec(p1) and isvec(p2):
            F2 = jnp.abs(jnp.vdot(
                jnp.reshape(p1, (-1,)), jnp.reshape(p2, (-1,))
            )) ** 2
            return F2 if squared else jnp.sqrt(F2)
        k, r = (p1, p2) if isvec(p1) else (p2, p1)
        k = jnp.reshape(k, (-1, 1))
        F2 = jnp.real((dag(k) @ r @ k)[0, 0])
        return F2 if squared else jnp.sqrt(F2)
    sp1 = sqrtm(p1)
    m = sqrtm(sp1 @ p2 @ sp1)
    F = jnp.real(jnp.trace(m))
    return F**2 if squared else F


def purify(rho):
    """Purify a density operator into a ket on a doubled space
    (reference ``purify``)."""
    rho = jnp.asarray(rho)
    d = rho.shape[0]
    el, ev = jnp.linalg.eigh(rho)
    el = jnp.clip(el.real, 0.0, None)
    # Psi[a, i] = sqrt(l_i) v_i[a]:  rho_A = Psi Psi†
    psi = (ev * jnp.sqrt(el)).astype(rho.dtype)
    return jnp.reshape(psi, (-1, 1))


def dephase(rho, p, rand_rank=None):
    """Dephase ``rho`` by amount ``p``."""
    rho = dop(rho)
    d = rho.shape[0]
    return (1 - p) * rho + p * jnp.diag(jnp.diag(rho))


def kraus_op(rho, Ek, dims=None, where=None, check=False):
    """Apply a Kraus channel sum_k E_k rho E_k† (reference
    ``kraus_op``)."""
    rho = dop(rho)
    Ek = jnp.asarray(Ek)
    if Ek.ndim == 2:
        Ek = Ek[None, ...]
    if where is not None:
        from .core import ikron

        dims = tuple(dims)
        Ek = jnp.stack([
            jnp.asarray(ikron(np.asarray(E), dims, where)) for E in Ek
        ])
    return jnp.einsum("kab,bc,kdc->ad", Ek, rho, jnp.conj(Ek))


def projector(A, eigenvalue=1.0, tol=1e-12, autoblock=False):
    """Projector onto the ``eigenvalue`` eigenspace of hermitian A."""
    el, ev = jnp.linalg.eigh(jnp.asarray(A))
    mask = jnp.abs(el - eigenvalue) < tol
    P = (ev * mask) @ dag(ev)
    return P


def measure(p, A, eigenvalue=None, tol=1e-12, seed=None):
    """Measure state ``p`` with hermitian operator ``A``, collapsing
    (reference ``measure`` calc.py:246). Returns (eigenvalue, p_after)."""
    el, ev = jnp.linalg.eigh(jnp.asarray(A))
    el_np = np.asarray(el)
    # group (nearly) degenerate eigenvalues
    groups = []
    for i, lam in enumerate(el_np):
        if groups and abs(groups[-1][0] - lam) < tol:
            groups[-1][1].append(i)
        else:
            groups.append((lam, [i]))

    if isket(p):
        amps = dag(ev) @ p  # coefficients
        pr = np.asarray(jnp.abs(amps[:, 0]) ** 2)
        probs = np.array([pr[idx].sum() for _, idx in groups])
        probs = probs / probs.sum()
        if eigenvalue is None:
            rng = np.random.default_rng(seed)
            gi = rng.choice(len(groups), p=probs)
        else:
            gi = int(np.argmin([abs(g[0] - eigenvalue) for g in groups]))
        lam, idx = groups[gi]
        mask = np.zeros(el_np.size)
        mask[idx] = 1.0
        proj_amps = amps * jnp.asarray(mask)[:, None]
        p_after = ev @ proj_amps
        p_after = p_after / jnp.linalg.norm(p_after)
        return lam, p_after
    else:
        rho = jnp.asarray(p)
        probs = np.array([
            float(jnp.real(jnp.einsum(
                "ai,ab,bi->", jnp.conj(ev[:, idx]), rho, ev[:, idx]
            ))) for _, idx in groups
        ])
        probs = np.clip(probs, 0, None)
        probs = probs / probs.sum()
        if eigenvalue is None:
            rng = np.random.default_rng(seed)
            gi = rng.choice(len(groups), p=probs)
        else:
            gi = int(np.argmin([abs(g[0] - eigenvalue) for g in groups]))
        lam, idx = groups[gi]
        P = (ev[:, idx]) @ dag(ev[:, idx])
        p_after = P @ rho @ P / probs[gi]
        return lam, p_after


def simulate_counts(p, C, phys_dim=2, seed=None):
    """Simulate ``C`` measurement counts in the computational basis
    (reference ``simulate_counts`` calc.py:328)."""
    p = jnp.asarray(p)
    if isket(p):
        pr = np.asarray(jnp.abs(p[:, 0]) ** 2)
    elif isop(p):
        pr = np.asarray(jnp.real(jnp.diag(p)))
    else:
        pr = np.asarray(jnp.abs(jnp.reshape(p, (-1,))) ** 2)
    pr = np.clip(pr, 0, None)
    pr = pr / pr.sum()
    d = pr.size
    n = int(round(math.log(d, phys_dim)))
    rng = np.random.default_rng(seed)
    samples = rng.choice(d, size=C, p=pr)
    counts = {}
    for s in samples:
        b = np.base_repr(s, phys_dim).zfill(n)
        counts[b] = counts.get(b, 0) + 1
    return counts


def entropy(a, rank=None):
    """Von Neumann entropy in bits (reference ``entropy``
    calc.py:423). Accepts a density op or a vector of eigenvalues/
    schmidt coefficients."""
    a = jnp.asarray(a)
    if a.ndim == 1 or (a.ndim == 2 and 1 in a.shape):
        el = jnp.reshape(a, (-1,)).real
    else:
        el = jnp.linalg.eigvalsh(a).real
    el = jnp.clip(el, 0.0, None)
    el_safe = jnp.where(el > 1e-300, el, 1.0)
    return float(-jnp.sum(el * jnp.log2(el_safe)))


entropy_subsys_approx = None  # set below after SLQ import


def entropy_subsys(psi_ab, dims, sysa, approx_thresh=2**13, **approx_opts):
    """Entropy of a subsystem of a pure state, exact or via SLQ for
    large subsystems (reference ``entropy_subsys``)."""
    if isinstance(sysa, numbers.Integral):
        sysa = (sysa,)
    sz_a = prod(dims[i] for i in sysa)
    sz_b = prod(dims) // sz_a
    if sz_a > sz_b:
        # use the complement (same entropy for pure states)
        sysa = tuple(i for i in range(len(dims)) if i not in sysa)
        sz_a = sz_b
    if approx_thresh is not None and sz_a >= approx_thresh:
        from .linalg.approx_spectral import entropy_subsys_approx as esa

        return esa(psi_ab, dims, sysa, **approx_opts)
    rho = ptr(psi_ab, dims, sysa)
    return entropy(rho)


def mutinf(p, dims=(2, 2), sysa=0, rank=None):
    """Mutual information I(A:B) (reference ``mutinf`` calc.py:486)."""
    if isinstance(sysa, numbers.Integral):
        sysa = (sysa,)
    sysb = tuple(i for i in range(len(dims)) if i not in sysa)
    hab = 0.0 if isvec(p) else entropy(p)
    ha = entropy(ptr(p, dims, sysa))
    hb = entropy(ptr(p, dims, sysb))
    return ha + hb - hab


mutual_information = mutinf


def mutinf_subsys(psi_abc, dims, sysa, sysb, approx_thresh=2**13,
                  **approx_opts):
    """Mutual information between two subsystems of a pure state."""
    if isinstance(sysa, numbers.Integral):
        sysa = (sysa,)
    if isinstance(sysb, numbers.Integral):
        sysb = (sysb,)
    sysab = tuple(sorted((*sysa, *sysb)))
    ha = entropy_subsys(psi_abc, dims, sysa, approx_thresh,
                        **approx_opts)
    hb = entropy_subsys(psi_abc, dims, sysb, approx_thresh,
                        **approx_opts)
    hab = entropy_subsys(psi_abc, dims, sysab, approx_thresh,
                         **approx_opts)
    return ha + hb - hab


def schmidt_gap(psi_ab, dims, sysa):
    """Difference between the two largest schmidt coefficients
    squared."""
    rho = ptr(psi_ab, dims, sysa)
    el = jnp.linalg.eigvalsh(rho)
    return float(el[-1] - el[-2])


def tr_sqrt(A, rank=None):
    """Trace of the sqrt of positive ``A``."""
    el = jnp.linalg.eigvalsh(jnp.asarray(A))
    return float(jnp.sum(jnp.sqrt(jnp.clip(el.real, 0.0, None))))


def tr_sqrt_subsys(psi_ab, dims, sysa, approx_thresh=2**13,
                   **approx_opts):
    if isinstance(sysa, numbers.Integral):
        sysa = (sysa,)
    sz_a = prod(dims[i] for i in sysa)
    if approx_thresh is not None and sz_a >= approx_thresh:
        from .linalg.approx_spectral import tr_sqrt_subsys_approx

        return tr_sqrt_subsys_approx(psi_ab, dims, sysa, **approx_opts)
    return tr_sqrt(ptr(psi_ab, dims, sysa))


def partial_transpose(p, dims=(2, 2), sysa=0):
    """Partial transpose (reference ``partial_transpose``)."""
    if isinstance(sysa, numbers.Integral):
        sysa = (sysa,)
    p = dop(p)
    n = len(dims)
    t = jnp.reshape(p, tuple(dims) * 2)
    perm = [
        (i + n if i in sysa else i) for i in range(n)
    ] + [
        (i - n if (i - n) in sysa else i) for i in range(n, 2 * n)
    ]
    t = jnp.transpose(t, perm)
    d = prod(dims)
    return jnp.reshape(t, (d, d))


def partial_transpose_norm(p, dims=(2, 2), sysa=0):
    """Trace norm of the partial transpose."""
    pt = partial_transpose(p, dims, sysa)
    return float(norm(pt, "tr"))


def logneg(p, dims=(2, 2), sysa=0):
    """Logarithmic negativity (reference ``logneg`` calc.py:751)."""
    return max(0.0, math.log2(partial_transpose_norm(p, dims, sysa)))


logarithmic_negativity = logneg


def logneg_subsys(psi_abc, dims, sysa, sysb, approx_thresh=2**13,
                  **approx_opts):
    """Logarithmic negativity between two subsystems of a pure state."""
    if isinstance(sysa, numbers.Integral):
        sysa = (sysa,)
    if isinstance(sysb, numbers.Integral):
        sysb = (sysb,)
    sysab = tuple(sorted((*sysa, *sysb)))
    szab = prod(dims[i] for i in sysab)
    if approx_thresh is not None and szab >= approx_thresh:
        from .linalg.approx_spectral import logneg_subsys_approx

        return logneg_subsys_approx(psi_abc, dims, sysa, sysb,
                                    **approx_opts)
    rho_ab = ptr(psi_abc, dims, sysab)
    new_dims = tuple(dims[i] for i in sysab)
    new_sysa = tuple(sysab.index(i) for i in sysa)
    return logneg(rho_ab, new_dims, new_sysa)


def negativity(p, dims=(2, 2), sysa=0):
    """Negativity (reference ``negativity``)."""
    return max(0.0, (partial_transpose_norm(p, dims, sysa) - 1) / 2)


def concurrence(p, dims=(2, 2), sysa=0, sysb=1):
    """Concurrence of a two-qubit state (reference ``concurrence``
    calc.py:879)."""
    from .gen.operators import pauli

    Y = np.asarray(pauli("Y"))
    YY = jnp.asarray(np.kron(Y, Y))
    if isvec(p):
        k = jnp.reshape(jnp.asarray(p), (-1, 1))
        c = jnp.abs((jnp.transpose(k) @ YY @ k))[0, 0]
        return float(c)
    rho = dop(p)
    rho_t = YY @ jnp.conj(rho) @ YY
    m = rho @ rho_t
    # general eig: host-class operation (no geev on TPU)
    el = np.linalg.eigvals(np.asarray(m))
    sqel = np.sqrt(np.clip(np.sort(el.real), 0, None))[::-1]
    return float(max(0.0, sqel[0] - sqel[1] - sqel[2] - sqel[3]))


def one_way_classical_information(p_ab, prjs, precomp_func=False):
    """One-way classical information J(A|B) given measurement
    projectors ``prjs`` on B (reference calc.py)."""
    p_a = ptr(p_ab, (2, 2), 0)

    def fn(prjs):
        out = entropy(p_a)
        for prj in prjs:
            prj = jnp.asarray(prj)
            from .core import ikron

            PB = jnp.asarray(ikron(np.asarray(prj), (2, 2), 1))
            prob = float(jnp.real(jnp.trace(PB @ p_ab)))
            if prob > 1e-12:
                p_after = ptr(PB @ p_ab @ PB / prob, (2, 2), 0)
                out -= prob * entropy(p_after)
        return out

    return fn if precomp_func else fn(prjs)


def quantum_discord(p, dims=(2, 2), sysa=0, sysb=1, method="COBYLA",
                    tol=1e-12, maxiter=2**14):
    """Quantum discord via optimization over measurement bases
    (reference ``quantum_discord`` calc.py:951)."""
    from scipy.optimize import minimize

    p = dop(p)
    iab = mutinf(p, dims)

    def trial(x):
        theta, phi = x
        v = np.array([
            math.cos(theta / 2),
            math.sin(theta / 2) * np.exp(1j * phi),
        ])
        prj0 = np.outer(v, v.conj())
        prj1 = np.eye(2) - prj0
        j = one_way_classical_information(p, [prj0, prj1])
        return iab - j

    best = np.inf
    for x0 in ([1.0, 1.0], [0.5, 2.0], [2.0, 0.5]):
        res = minimize(trial, x0, method=method, tol=tol,
                       options={"maxiter": maxiter})
        best = min(best, res.fun)
    return float(max(best, 0.0))


def trace_distance(p1, p2):
    """Trace distance between two states (reference
    ``trace_distance``)."""
    v1, v2 = isvec(p1), isvec(p2)
    if v1 and v2:
        F2 = jnp.abs(jnp.vdot(jnp.reshape(p1, (-1,)),
                              jnp.reshape(p2, (-1,)))) ** 2
        return float(jnp.sqrt(1 - F2))
    return float(0.5 * norm(dop(p1) - dop(p2), "tr"))


def cprint(psi, prec=6):
    """Print a state in computational basis notation."""
    psi = np.asarray(psi).reshape(-1)
    n = int(round(math.log2(psi.size)))
    parts = []
    for i, c in enumerate(psi):
        if abs(c) > 10.0 ** (-prec):
            parts.append(f"({c:.{prec}g})|{i:0{n}b}>")
    print(" + ".join(parts))


def decomp(a, fn, fn_args, fn_d, nmlz_func, mode="p", tol=1e-3):
    """Decompose operator ``a`` in the Hilbert-Schmidt basis generated
    by ``fn`` over all length-``n`` permutations of ``fn_args``
    (reference ``decomp`` calc.py:1098).

    Parameters mirror the reference: ``fn(x)`` builds one single-site
    basis operator (or state) of dimension ``fn_d``; ``nmlz_func(n)``
    gives the normalization for ``n`` sites; ``mode`` may contain
    ``'p'`` (print sorted contributions above 1e-2, with decimal
    places derived from ``tol``) and/or ``'c'`` (return an ordered
    dict sorted by descending ``|coefficient|``).
    """
    import collections

    from .core import infer_size

    a = jnp.asarray(a)
    if isvec(a):
        a = dop(a)
    n = infer_size(a, base=fn_d)

    # stack all basis operators and batch the Hilbert-Schmidt inner
    # products into a single device contraction — one (k, d, d) x
    # (d, d) einsum instead of 4^n tiny matmuls
    names, ops = [], []
    nm = nmlz_func(n)
    for perm in itertools.product(fn_args, repeat=n):
        op = functools.reduce(np.kron, (np.asarray(fn(x)) for x in perm))
        if op.shape[-1] == 1:  # state vector basis (e.g. bell states)
            op = op @ np.conj(op.T)
        names.append("".join(str(x) for x in perm))
        ops.append(op * nm)
    O = jnp.asarray(np.stack(ops))
    cffs = np.asarray(jnp.real(jnp.einsum("kij,ji->k", O, a)))

    names_cffs = sorted(zip(names, cffs), key=lambda p: -abs(p[1]))
    out = collections.OrderedDict(
        (k, float(v)) for k, v in names_cffs
    )
    if "p" in mode:
        dps = int(round(0.5 - np.log10(1.001 * tol)))
        for k, v in out.items():
            if abs(v) < 0.01:
                break
            print(k, "{: .{prec}f}".format(v, prec=dps))
    if "c" in mode:
        return out


def pauli_decomp(a, mode="p", tol=1e-3):
    """Decompose ``a`` into pauli string components (reference
    ``pauli_decomp`` calc.py:1160)."""
    from .gen.operators import pauli

    return decomp(
        a, fn=pauli, fn_args="IXYZ", fn_d=2,
        nmlz_func=lambda n: 2.0 ** -n, mode=mode, tol=tol,
    )


def bell_decomp(a, mode="p", tol=1e-3):
    """Decompose ``a`` into the tensor-product bell-state basis
    (reference ``bell_decomp`` calc.py:1165)."""
    from .gen.states import bell_state

    return decomp(
        a, fn=bell_state, fn_args=(0, 1, 2, 3), fn_d=4,
        nmlz_func=lambda n: 1.0, mode=mode, tol=tol,
    )


def correlation(p, A, B, sysa, sysb, dims=None, sparse=None,
                precomp_func=False):
    """Correlation <A_a B_b> - <A_a><B_b> (reference
    ``correlation``)."""
    from .core import ikron

    if dims is None:
        n = int(round(math.log2(np.shape(p)[0])))
        dims = (2,) * n

    A = np.asarray(A)
    B = np.asarray(B)
    OA = jnp.asarray(ikron(A, dims, sysa))
    OB = jnp.asarray(ikron(B, dims, sysb))
    OAB = jnp.asarray(ikron([A, B], dims, (sysa, sysb)))

    def fn(state):
        eab = float(jnp.real(expectation(OAB, state)))
        ea = float(jnp.real(expectation(OA, state)))
        eb = float(jnp.real(expectation(OB, state)))
        return eab - ea * eb

    return fn if precomp_func else fn(p)


def pauli_correlations(p, ss=("xx", "yy", "zz"), sysa=0, sysb=1,
                       sum_abs=False, precomp_func=False):
    """Pauli correlations <s_a s_b> - <s_a><s_b>
    (reference ``pauli_correlations``)."""
    from .gen.operators import pauli

    fs = tuple(
        correlation(p, pauli(s[0]), pauli(s[1]), sysa, sysb,
                    precomp_func=precomp_func)
        for s in ss
    )
    if sum_abs:
        if precomp_func:
            return lambda state: sum(abs(f(state)) for f in fs)
        return sum(abs(f) for f in fs)
    return fs


def ent_cross_matrix(p, sz_blc=1, ent_fn=logneg, calc_self_ent=True,
                     upscale=False):
    """Block-entanglement cross matrix (reference
    ``ent_cross_matrix``)."""
    p = jnp.asarray(p)
    n = int(round(math.log2(p.shape[0])))
    nb = n // sz_blc
    dims = (2,) * n
    out = np.zeros((nb, nb))
    for i in range(nb):
        for j in range(i, nb):
            sysa = tuple(range(i * sz_blc, (i + 1) * sz_blc))
            sysb = tuple(range(j * sz_blc, (j + 1) * sz_blc))
            if i == j:
                if calc_self_ent:
                    rho = ptr(p, dims, sysa)
                    # entanglement with rest
                    out[i, j] = entropy(rho)
                else:
                    out[i, j] = np.nan
            else:
                rho_ab = ptr(p, dims, sysa + sysb)
                sub_dims = (2,) * (2 * sz_blc)
                out[i, j] = out[j, i] = ent_fn(
                    rho_ab, sub_dims, tuple(range(sz_blc))
                )
    return out


def qid(p, dims, inds, precomp_func=False, sparse_comp=True,
        norm_func=None, power=2, coeff=1):
    """Quantumness identifiers (reference ``qid``)."""
    from .gen.operators import pauli

    p = jnp.asarray(p)
    if norm_func is None:
        # reference default is the spectral (operator-2) norm
        # (calc.py:1360 ``norm_func=norm`` with ntype=2)
        from .linalg.base_linalg import norm_2

        norm_func = lambda x: float(norm_2(x))

    def fn(state):
        rho = dop(state)
        out = []
        for i in inds:
            tot = 0.0
            for s in "xyz":
                from .core import ikron

                S = jnp.asarray(ikron(np.asarray(pauli(s)), dims, i))
                comm = S @ rho - rho @ S
                tot += coeff * norm_func(comm) ** power
            out.append(tot)
        return np.array(out)

    return fn if precomp_func else fn(p)


def is_degenerate(op, tol=1e-12):
    """Number of degeneracies in the spectrum (0 if none)."""
    if isinstance(op, (list, tuple, np.ndarray)) and \
            np.ndim(op) == 1:
        el = np.sort(np.asarray(op))
    else:
        el = np.asarray(jnp.linalg.eigvalsh(jnp.asarray(op)))
    gaps = np.diff(el)
    scale = max(abs(el[0]), abs(el[-1]), 1e-300)
    return int(np.sum(gaps < tol * scale))


def is_eigenvector(x, A, tol=1e-14):
    """Whether ``x`` is an eigenvector of ``A``."""
    x = jnp.reshape(jnp.asarray(x), (-1, 1))
    y = jnp.asarray(A) @ x
    lam = (dag(x) @ y)[0, 0]
    resid = float(jnp.linalg.norm(y - lam * x))
    return resid < tol * max(1.0, abs(complex(lam)))


def page_entropy(sz_subsys, sz_total):
    """Page (average) entropy in bits of a subsystem of dimension
    ``sz_subsys`` of a random pure state of total dimension
    ``sz_total`` (reference ``page_entropy`` calc.py:1439)."""
    if sz_subsys > sz_total**0.5:
        sz_subsys = sz_total // sz_subsys
    n = sz_total // sz_subsys
    s = 0.0
    for k in range(n + 1, sz_total + 1):
        s += 1.0 / k
    s -= (sz_subsys - 1) / (2 * n)
    return s / math.log(2)


def heisenberg_energy(L):
    """Asymptotic ground energy of the length-``L`` spin-1/2 isotropic
    antiferromagnetic Heisenberg chain (spin-operator convention),
    from the scaling formula of Nickel, J. Phys. Commun. 1, 055021
    (2017) (used identically by the reference for testing,
    calc.py:1469)."""
    Einf = (0.5 - 2 * math.log(2)) * L
    Efinite = math.pi**2 / (6 * L)
    correction = 1 + 0.375 / math.log(L) ** 3
    return (Einf - Efinite * correction) / 2


__all__ = [
    "fidelity", "purify", "dephase", "kraus_op", "projector", "measure",
    "simulate_counts", "entropy", "entropy_subsys", "mutinf",
    "mutual_information", "mutinf_subsys", "schmidt_gap", "tr_sqrt",
    "tr_sqrt_subsys", "partial_transpose", "partial_transpose_norm",
    "logneg", "logarithmic_negativity", "logneg_subsys", "negativity",
    "concurrence", "one_way_classical_information", "quantum_discord",
    "trace_distance", "cprint", "decomp", "pauli_decomp", "bell_decomp",
    "correlation", "pauli_correlations", "ent_cross_matrix", "qid",
    "is_degenerate", "is_eigenvector", "page_entropy",
    "heisenberg_energy",
]
