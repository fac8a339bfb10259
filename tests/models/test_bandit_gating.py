"""BanditGating behavior: UCB semantics, not just API shape.

Reference spec (/root/reference/src/core/liquid_moe.py:106-136): reward =
max(0, 1 - 0.1*error) per update, UCB score = mean reward +
c*sqrt(log t / pulls), select_top_k renormalizes the selected experts'
gates by UCB score mass.
"""

import numpy as np

from aura_snn_rag_tpu.models.brain.liquid_moe import BanditGating


def test_reward_mapping_and_mean_tracking():
    b = BanditGating(n_experts=3)
    b.update(0, error=0.0)     # reward 1.0
    b.update(0, error=5.0)     # reward 0.5
    b.update(0, error=20.0)    # reward max(0, -1) = 0.0
    np.testing.assert_allclose(b.mean_reward[0], (1.0 + 0.5 + 0.0) / 3)
    assert b.pulls[0] == 3 and b.total_pulls == 3
    assert b.mean_reward[1] == 0.0 and b.pulls[1] == 0


def test_converges_to_best_arm():
    """With a clearly best expert, UCB must route the overwhelming
    majority of pulls to it after burn-in."""
    rng = np.random.RandomState(0)
    b = BanditGating(n_experts=4, exploration_factor=0.1)
    true_err = [8.0, 2.0, 6.0, 9.0]       # expert 1 is best
    picks = []
    for t in range(400):
        top, _ = b.select_top_k(1, np.full(4, 0.25))
        arm = top[0]
        picks.append(arm)
        b.update(arm, true_err[arm] + rng.randn() * 0.5)
    late = picks[200:]
    assert np.mean(np.asarray(late) == 1) > 0.9, np.bincount(late)


def test_explores_every_arm():
    """The exploration bonus must pull every arm at least once even when
    an early arm looks perfect."""
    b = BanditGating(n_experts=6, exploration_factor=0.5)
    for _ in range(60):
        top, _ = b.select_top_k(1, np.full(6, 1 / 6))
        b.update(top[0], error=0.0)       # every arm rewards 1.0
    assert (b.pulls > 0).all(), b.pulls


def test_select_top_k_renormalizes_selected_gates():
    b = BanditGating(n_experts=4)
    for arm, err in [(0, 0.0), (1, 5.0), (2, 9.0), (3, 9.5)]:
        b.update(arm, err)
    base = np.asarray([0.25, 0.25, 0.25, 0.25])
    top, gates = b.select_top_k(2, base)
    scores = b.get_ucb_scores()
    assert top == sorted(range(4), key=lambda i: -scores[i])[:2]
    # selected gates = score / selected mass; unselected untouched
    mass = scores[top].sum()
    np.testing.assert_allclose(gates[top], scores[top] / mass)
    untouched = [i for i in range(4) if i not in top]
    np.testing.assert_allclose(gates[untouched], 0.25)
    np.testing.assert_allclose(gates[top].sum(), 1.0)


def test_top_k_ordering_descending():
    b = BanditGating(n_experts=5)
    for arm, err in [(0, 9.0), (1, 1.0), (2, 5.0), (3, 3.0), (4, 7.0)]:
        for _ in range(5):
            b.update(arm, err)
    top, _ = b.select_top_k(3, np.full(5, 0.2))
    scores = b.get_ucb_scores()
    assert list(top) == sorted(top, key=lambda i: -scores[i])
    assert top[0] == 1          # lowest error -> highest mean reward
