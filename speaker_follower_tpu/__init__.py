"""speaker_follower_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the speaker-follower vision-and-language-navigation stack
(Fried, Hu, Cirik et al., NeurIPS 2018) and its Matterport3D simulator.

Layer map (mirrors reference layers, re-designed TPU-first):

  data/        connectivity graphs -> packed arrays, R2R datasets, tokenizer,
               feature banks (replaces reference tasks/R2R/utils.py + the data
               half of env.py)
  env/         vectorized navigation-graph environment (replaces the C++
               MatterSim simulator + EnvBatch/R2RBatch: all of reset/observe/
               step are batched jit-able array programs), plus a single-sim
               API facade for simulator-semantics tests
  models/      follower & speaker seq2seq LSTM models as pure-JAX pytrees
               (replaces tasks/R2R/model.py)
  ops/         Pallas TPU kernels for the fused attention decoder step
  agents/      rollout/scoring/beam-search/state-factored-search
               (replaces tasks/R2R/follower.py + speaker.py)
  training/    train loops, optimizers, checkpointing (replaces train.py,
               train_speaker.py)
  evaluation/  R2R eval protocol + multi-bleu reimplementation (replaces
               eval.py, eval_speaker.py, bleu.py)
  parallel/    jax.sharding Mesh helpers: data-parallel episode sharding
  inference/   pragmatic (rational) follower/speaker + data augmentation
"""

__version__ = "0.1.0"
