"""Discrete-inference examples: Asia Bayes net, HMM chain, UGM-style MRF.

Mirrors the reference's DiscreteBayesNetExample.cpp / HMMExample.cpp /
UGM_chain.cpp / UGM_small.cpp on the same dense-table discrete layer
(discrete/discrete.py). Every inference result is cross-checked against
brute-force enumeration in this script — the strongest self-verification
available for small domains.

Run:
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             exec(open('examples/discrete_examples.py').read())"
"""

import itertools

import numpy as np


def brute_force_best(factors_or_bn, variables, cards, evaluate):
    best, best_p = None, -1.0
    for combo in itertools.product(*[range(cards[v]) for v in variables]):
        a = dict(zip(variables, combo))
        p = evaluate(a)
        if p > best_p:
            best, best_p = a, p
    return best, best_p


def asia_network():
    """The classic Asia network via Signature-string CPTs (reference:
    DiscreteBayesNetExample.cpp)."""
    from gtsam_personal_tpu.discrete.discrete import (DiscreteFactorGraph,
                                                      parse_signature)
    A, S, T, L, B, E, X, D = range(8)
    conds = [
        parse_signature("99/1", A, ()),
        parse_signature("50/50", S, ()),
        parse_signature("99/1 95/5", T, (A,), (2,)),
        parse_signature("99/1 90/10", L, (S,), (2,)),
        parse_signature("70/30 40/60", B, (S,), (2,)),
        # Either = T or L (deterministic OR)
        parse_signature("1/0 0/1 0/1 0/1", E, (T, L), (2, 2)),
        parse_signature("95/5 2/98", X, (E,), (2,)),
        parse_signature("9/1 2/8 3/7 1/9", D, (E, B), (2, 2)),
    ]
    g = DiscreteFactorGraph()
    for c in conds:
        # conditional table has frontal axis FIRST: factor vars = (f, *parents)
        g.add((c.frontal,) + tuple(c.parents), c.table)

    names = "Asia Smoking Tuberculosis LungCancer Bronchitis Either XRay Dyspnea".split()
    cards = {v: 2 for v in range(8)}

    mpe = g.optimize()
    bf, bf_p = brute_force_best(g, list(range(8)), cards, g.evaluate)
    print("Asia MPE:", {names[v]: mpe[v] for v in sorted(mpe)})
    assert all(mpe[v] == bf[v] for v in range(8)), (mpe, bf)

    mB = np.asarray(g.marginal(B))
    # brute-force marginal
    tot = np.zeros(2)
    for combo in itertools.product(range(2), repeat=8):
        a = dict(zip(range(8), combo))
        tot[a[B]] += g.evaluate(a)
    np.testing.assert_allclose(mB, tot / tot.sum(), atol=1e-10)
    print(f"P(Bronchitis) = {mB[1]:.4f} (brute-force match)")

    # posterior given evidence Dyspnea=1: condition by adding an indicator
    g2 = DiscreteFactorGraph()
    for c in conds:
        g2.add((c.frontal,) + tuple(c.parents), c.table)
    g2.add((D,), np.array([0.0, 1.0]))
    mT = np.asarray(g2.marginal(T))
    print(f"P(Tuberculosis | Dyspnea=1) = {mT[1]:.4f}")
    assert mT[1] > np.asarray(g.marginal(T))[1]  # evidence raises suspicion
    return True


def hmm_chain(n=5):
    """HMM max-product decode (reference: HMMExample.cpp)."""
    from gtsam_personal_tpu.discrete.discrete import DiscreteFactorGraph
    rng = np.random.default_rng(0)
    trans = np.array([[0.8, 0.2], [0.3, 0.7]])     # [from, to]
    emit = np.array([[0.9, 0.1], [0.2, 0.8]])      # [state, obs]
    obs = rng.integers(0, 2, size=n)
    g = DiscreteFactorGraph()
    g.add((0,), np.array([0.5, 0.5]) * emit[:, obs[0]])
    for i in range(1, n):
        g.add((i - 1, i), trans)
        g.add((i,), emit[:, obs[i]])
    mpe = g.optimize()
    cards = {v: 2 for v in range(n)}
    bf, _ = brute_force_best(g, list(range(n)), cards, g.evaluate)
    assert all(mpe[v] == bf[v] for v in range(n)), (mpe, bf)
    print(f"HMM obs={obs.tolist()} -> Viterbi states "
          f"{[mpe[v] for v in range(n)]} (brute-force match)")
    return True


def ugm_chain(n=6, card=3):
    """Chain MRF marginals + partition function (reference: UGM_chain.cpp)."""
    from gtsam_personal_tpu.discrete.discrete import DiscreteFactorGraph
    rng = np.random.default_rng(1)
    g = DiscreteFactorGraph()
    unary = rng.uniform(0.5, 2.0, size=(n, card))
    pair = rng.uniform(0.5, 2.0, size=(n - 1, card, card))
    for i in range(n):
        g.add((i,), unary[i])
    for i in range(n - 1):
        g.add((i, i + 1), pair[i])
    m0 = np.asarray(g.marginal(0))
    tot = np.zeros(card)
    Z = 0.0
    for combo in itertools.product(range(card), repeat=n):
        a = dict(zip(range(n), combo))
        p = g.evaluate(a)
        tot[a[0]] += p
        Z += p
    np.testing.assert_allclose(m0, tot / tot.sum(), atol=1e-10)
    print(f"UGM chain: P(x0) = {np.round(m0, 4).tolist()}, Z = {Z:.4f} "
          f"(brute-force match)")
    return True


def main():
    ok = asia_network() and hmm_chain() and ugm_chain()
    print("DISCRETE-EXAMPLES OK" if ok else "DISCRETE-EXAMPLES FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
