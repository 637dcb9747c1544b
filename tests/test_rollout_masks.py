"""Property tests for the static rollout decision masks
(srvp.rollout_masks): these encode the reference's loop semantics
(srvp.py:377-405) and everything downstream indexes by them."""

import numpy as np
import pytest

from srvp_tpu.models.srvp import rollout_masks


@pytest.mark.parametrize("nt", [2, 3, 5, 16, 100])
@pytest.mark.parametrize("o", [1, 2, 3, 5])
@pytest.mark.parametrize("nt_hx", [0, 1, 3, 100])
def test_mask_invariants(nt, o, nt_hx):
    t_data, new_step, use_post, keep = rollout_masks(nt, o, nt_hx)
    n_steps = o * (nt - 1)
    assert len(t_data) == len(new_step) == len(use_post) == len(keep) == n_steps
    # one new z per integer frame (reference: new_step gates z resampling)
    assert new_step.sum() == nt - 1
    # one kept state per integer frame (remove_intermediate=True)
    assert keep.sum() == nt - 1
    # the first substep always starts a new frame
    if n_steps:
        assert new_step[0]
        # the last substep always lands on an integer frame
        assert keep[-1]
    # t_data is the ceil of the continuous time: nondecreasing, steps of 0/1
    assert (np.diff(t_data) >= 0).all() and (np.diff(t_data) <= 1).all()
    # z is reused within a frame: between new steps, t_data is constant
    assert (t_data[new_step] == np.arange(1, nt)).all()
    # observations are a PREFIX in time: once beyond hx, never posterior again
    post = use_post.astype(int)
    assert (np.diff(post) <= 0).all()
    # posterior exactly when the target frame has an encoding
    assert (use_post == (t_data < nt_hx)).all()


def test_oversampling_substep_structure():
    t_data, new_step, use_post, keep = rollout_masks(4, 3, 10)
    # substeps: frames 1,1,1, 2,2,2, 3,3,3
    assert list(t_data) == [1, 1, 1, 2, 2, 2, 3, 3, 3]
    assert list(new_step) == [1, 0, 0, 1, 0, 0, 1, 0, 0]
    assert list(keep) == [0, 0, 1, 0, 0, 1, 0, 0, 1]
