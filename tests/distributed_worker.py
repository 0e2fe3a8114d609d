"""Worker process for the multi-host CPU training test (not a pytest
module).  Launched by tests/test_distributed.py with:

    python distributed_worker.py <rank> <world> <port> <data_dir> <out_dir>

Initializes jax.distributed over localhost, builds the TINY model,
trains 1 epoch on the shared synthetic dataset with a (world*2, 1)
global mesh, and writes its loss history to out_dir/losses_rank<r>.json.
"""

import json
import os
import sys


def main():
    rank, world, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    data_dir, out_dir = sys.argv[4], sys.argv[5]

    # 2 local CPU devices per process, BEFORE jax import
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    import jax
    jax.config.update('jax_platforms', 'cpu')

    if world > 1:
        jax.distributed.initialize(
            coordinator_address=f'localhost:{port}',
            num_processes=world, process_id=rank)
    assert jax.process_count() == world
    assert len(jax.devices()) == world * 2

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from renderformer_tpu.config import RenderFormerConfig
    from renderformer_tpu.models.renderformer import RenderFormer
    from renderformer_tpu.training.dataset import RenderFormerDataset
    from renderformer_tpu.training.state import TrainConfig
    from renderformer_tpu.training.trainer import (
        RenderFormerTrainer, TrainerConfig)

    cfg = RenderFormerConfig(
        latent_dim=72, num_layers=2, num_heads=2, dim_feedforward=144,
        num_register_tokens=4, vertex_pe_num_freqs=4,
        view_transformer_latent_dim=72, view_transformer_ffn_hidden_dim=144,
        view_transformer_n_heads=2, view_transformer_n_layers=4,
        dpt_features=16, dpt_out_channels=[8, 16, 32, 64])
    model = RenderFormer(cfg)
    params = model.init(jax.random.key(0))  # identical on every process

    dataset = RenderFormerDataset(
        h5_dir=data_dir, gt_dir=data_dir, max_resolution=32)
    n_epochs = int(os.environ.get('RFTPU_TEST_EPOCHS', '1'))
    tcfg = TrainerConfig(
        train=TrainConfig(num_epochs=n_epochs, precision='float32',
                          resolution=32, learning_rate=1e-4),
        batch_size=4,             # GLOBAL batch size
        train_val_split=1.0,      # all train, deterministic
        checkpoint_dir=os.path.join(out_dir, 'ckpt'),
        log_dir=os.path.join(out_dir, 'tb'),
        save_interval=1000,
        mesh_shape=(world * 2, 1),
        attn_impl='xla')
    trainer = RenderFormerTrainer(model, params, dataset, tcfg)
    result = trainer.fit()

    with open(os.path.join(out_dir, f'losses_rank{rank}.json'), 'w') as f:
        json.dump({'train_losses': result['train_losses'],
                   'world': world, 'rank': rank}, f)
    if world > 1:
        # rank 0 does extra post-epoch work (checkpoint, loss plot); sync
        # so both ranks hit the shutdown barrier together instead of
        # tripping its short timeout
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('renderformer_tpu_test_end')
        jax.distributed.shutdown()


if __name__ == '__main__':
    main()
