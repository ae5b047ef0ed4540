"""Speaker agent: gold-trajectory collection, instruction scoring/decoding,
and word-level beam search.

Replaces tasks/R2R/speaker.py.  The reference assembles per-step numpy
tensors by stepping C++ sims along teacher paths
(env.py:823-848 + speaker.py:68-121); here a jitted teacher rollout collects
the per-step panorama features and chosen-action embeddings directly on
device, and the word decoder runs as a lax.scan.

Parity notes:
  * the trajectory tensors exclude the post-stop duplicate observation and
    include the stop step with a zero action embedding
    (speaker.py:96-104 with _build_action_embedding's zero stop row);
  * padded steps are zero embeddings, and the encoder unroll length is the
    max path length IN THE BATCH (speaker.py:69-70) — we pass it as a
    static arg (at most ~7 distinct values -> bounded recompiles);
  * word loss: per-step NLL mean over non-<PAD> targets, summed over steps
    (speaker.py:182); word scores are log-probs of the chosen words;
  * the BOS input is vocab index 3 (speaker.py:137 with utils.py:19-24).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.text import BOS_IDX, EOS_IDX, PAD_IDX
from ..env import vecenv
from ..models import speaker as smodels


class GoldTrajectories(NamedTuple):
    action_embeddings: jnp.ndarray  # (B, T, E) chosen-action embedding
    world_features: jnp.ndarray  # (B, T, 36, E) pano features per step
    actions: jnp.ndarray  # (B, T) teacher actions taken
    nodes: jnp.ndarray  # (B, T) node AFTER each step
    path_mask: jnp.ndarray  # (B, T) True = padding (for ctx attention)
    path_len: jnp.ndarray  # (B,) number of actions incl. stop


@partial(jax.jit, static_argnames=("episode_len",))
def gold_rollout(tables: vecenv.EnvTables, batch, *, episode_len: int = 10):
    """Collect teacher trajectories + their observation tensors on device."""
    state = vecenv.reset(batch["scan"], batch["start_node"], batch["heading"])
    goal = batch["goal_node"]

    def step_fn(state, _):
        obs = vecenv.observe(tables, state, goal)
        live = ~state.done
        a = jnp.where(live, obs.teacher, 0)
        a_emb = jnp.take_along_axis(
            obs.action_embedding, a[:, None, None], axis=1
        )[:, 0]
        # zero padded steps (reference zero-initializes the batch tensors)
        a_emb = jnp.where(live[:, None], a_emb, 0.0)
        feat = jnp.where(live[:, None, None], obs.pano_feature, 0.0)
        new_state = vecenv.step(tables, state, a)
        return new_state, (a_emb, feat, a, new_state.node, live)

    final_state, (a_embs, feats, actions, nodes, live) = jax.lax.scan(
        step_fn, state, None, length=episode_len
    )
    to_bt = lambda x: jnp.swapaxes(x, 0, 1)
    live = to_bt(live)
    return GoldTrajectories(
        action_embeddings=to_bt(a_embs),
        world_features=to_bt(feats),
        actions=to_bt(actions),
        nodes=to_bt(nodes),
        path_mask=~live,
        path_len=live.sum(axis=1).astype(jnp.int32),
    )


class SpeakerOutput(NamedTuple):
    loss: jnp.ndarray  # scalar
    words: jnp.ndarray  # (B, L) chosen word at each step
    word_scores: jnp.ndarray  # (B, L) log-prob of chosen word
    active: jnp.ndarray  # (B, L) True while not ended (EOS not yet emitted)
    score: jnp.ndarray  # (B,) summed log-prob while active


@partial(
    jax.jit,
    static_argnames=(
        "feedback",
        "instruction_len",
        "unroll_len",
        "deterministic",
        "dropout_ratio",
        "use_glove",
        "use_input_att_feed",
    ),
)
def score_instructions(
    params,
    gold: GoldTrajectories,
    instr_seq,  # (B, L) int32: NOT reversed, EOS appended, PAD padded
    rng,
    *,
    feedback: str = "teacher",
    instruction_len: int = 80,
    unroll_len: int = 10,
    deterministic: bool = True,
    dropout_ratio: float = 0.5,
    use_glove: bool = True,
    use_input_att_feed: bool = False,
) -> SpeakerOutput:
    """Teacher/argmax/sample decode with NLL loss
    (speaker.py:123-202 _score_obs_actions_and_instructions)."""
    b = gold.path_len.shape[0]
    rng, enc_key = jax.random.split(rng)
    ctx, h_t, c_t = smodels.speaker_encoder_apply(
        params["encoder"],
        gold.action_embeddings[:, :unroll_len],
        gold.world_features[:, :unroll_len],
        dropout_ratio=dropout_ratio,
        deterministic=deterministic,
        rng=enc_key,
    )
    path_mask = gold.path_mask[:, :unroll_len]

    w0 = jnp.full((b,), BOS_IDX, jnp.int32)
    ended0 = jnp.zeros((b,), bool)

    def step_fn(carry, t):
        w_t, h, c, ended, rng = carry
        rng, drop_key, sample_key = jax.random.split(rng, 3)
        h1, c1, alpha, logit = smodels.speaker_decoder_step(
            params["decoder"],
            w_t,
            h,
            c,
            ctx,
            path_mask,
            dropout_ratio=dropout_ratio,
            use_glove=use_glove,
            use_input_att_feed=use_input_att_feed,
            deterministic=deterministic,
            rng=drop_key,
        )
        target = instr_seq[:, t]
        log_probs = jax.nn.log_softmax(logit, axis=-1)

        if feedback == "teacher":
            w_next = target
        elif feedback == "argmax":
            w_next = jnp.argmax(logit, axis=-1).astype(jnp.int32)
        elif feedback == "sample":
            w_next = jax.random.categorical(sample_key, logit, axis=-1).astype(
                jnp.int32
            )
        else:
            raise ValueError(f"invalid feedback option {feedback!r}")

        # loss: NLL of target, mean over non-PAD targets
        tgt_logp = jnp.take_along_axis(log_probs, target[:, None], axis=1)[:, 0]
        valid = target != PAD_IDX
        count = valid.sum()
        loss_t = jnp.where(
            count > 0, -(tgt_logp * valid).sum() / jnp.maximum(count, 1), 0.0
        )

        # word score: log-prob of the CHOSEN word (0 when it is PAD)
        w_logp = jnp.take_along_axis(log_probs, w_next[:, None], axis=1)[:, 0]
        w_logp = jnp.where(w_next == PAD_IDX, 0.0, w_logp)

        live = ~ended
        new_ended = ended | (w_next == EOS_IDX)
        return (w_next, h1, c1, new_ended, rng), (w_next, w_logp, live, loss_t)

    (_, _, _, _, _), (words, w_scores, live, losses) = jax.lax.scan(
        step_fn,
        (w0, h_t, c_t, ended0, rng),
        jnp.arange(instruction_len),
    )
    to_bl = lambda x: jnp.swapaxes(x, 0, 1)
    live = to_bl(live)
    w_scores = to_bl(w_scores)
    return SpeakerOutput(
        loss=losses.sum(),
        words=to_bl(words),
        word_scores=w_scores,
        active=live,
        score=(w_scores * live).sum(axis=1),
    )


def speaker_results_from_output(out: SpeakerOutput, instr_ids, tokenizer):
    """Reference-format output dicts: word_indices recorded while not ended
    (EOS itself included, speaker.py:184-191), words decoded break_on_eos."""
    words = np.asarray(out.words)
    scores = np.asarray(out.word_scores)
    active = np.asarray(out.active)
    total = np.asarray(out.score)
    results = {}
    for i, instr_id in enumerate(instr_ids):
        idxs = [int(w) for w, a in zip(words[i], active[i]) if a]
        results[instr_id] = {
            "instr_id": instr_id,
            "word_indices": idxs,
            "scores": [float(s) for s, a in zip(scores[i], active[i]) if a],
            "score": float(total[i]),
            "words": tokenizer.decode_sentence(idxs, break_on_eos=True, join=False),
        }
    return results
