"""Batch/video rendering CLI (parity with /root/reference/batch_infer.py).

Renders a folder of per-frame H5 scenes with static-shape padding (the
TPU-friendly batching the reference already used for video), writes
per-view EXR+PNG and an MP4.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser(
        description='Batch inference using triangle radiosity transformer (TPU)')
    parser.add_argument('--h5_folder', type=str, required=True)
    parser.add_argument('--model_id', type=str, default='v1-base')
    parser.add_argument('--precision', type=str,
                        choices=['bf16', 'fp16', 'fp32'], default='bf16')
    parser.add_argument('--view_precision', type=str,
                        choices=['bf16', 'fp16', 'fp32'], default=None,
                        help='Stage-2 precision; default = --precision '
                             '(fp32 restores the reference TF32 island)')
    parser.add_argument('--resolution', type=int, default=512)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--padding_length', type=int, default=None,
                        help='Pad all scenes to this triangle count '
                             '(required for batch_size > 1; enables a single '
                             'compiled program across frames)')
    parser.add_argument('--output_dir', type=str, default=None)
    parser.add_argument('--save_video', action='store_true', default=True)
    parser.add_argument('--fps', type=int, default=24)
    parser.add_argument('--tone_mapper', type=str,
                        choices=['none', 'agx', 'filmic', 'pbr_neutral'],
                        default='none')
    parser.add_argument('--attn_impl', type=str,
                        choices=['auto', 'xla', 'flash'], default='auto')
    parser.add_argument('--shard', action='store_true',
                        help='Shard inference over all visible devices '
                             '(GSPMD data x seq mesh)')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--video_mode', choices=['auto', 'on', 'off'],
                        default='auto',
                        help='Static-scene fast path: upload the scene '
                             'once, stream only cameras per frame, render '
                             'frames as views of the device-resident scene. '
                             'auto = probe whether frames 0/1 share scene '
                             'tensors bitwise')
    parser.add_argument('--transfer_dtype',
                        choices=['float32', 'float16'], default='float16',
                        help='Device->host image dtype: float16 halves '
                             'transfer bytes at EXR-half precision '
                             '(radiance is clamped to the fp16 max 65504 '
                             'on device; pass float32 for unquantized HDR '
                             'like the reference)')
    parser.add_argument('--frames_per_call', type=int, default=4,
                        help='Video mode: camera chunks rendered per '
                             'device program (lax.scan inside one jit) — '
                             'amortizes the per-dispatch round trip '
                             'through the device tunnel. 1 = one chunk '
                             'per dispatch')
    parser.add_argument('--no_output', action='store_true',
                        help='Benchmark mode: skip image fetch + file '
                             'writes, sync each batch with a 1-element '
                             'on-device checksum (measures the device '
                             'render path without host-transfer cost)')
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from renderformer_tpu.io.h5 import SceneFolderDataset
    from renderformer_tpu.io.image import write_exr, write_png, write_video
    from renderformer_tpu.pipelines.rendering_pipeline import RenderingPipeline
    from renderformer_tpu.utils.prefetch import AsyncWriter, prefetch
    from renderformer_tpu.utils.tone_map import ToneMapper

    pipeline = RenderingPipeline.from_pretrained(
        args.model_id, attn_impl=args.attn_impl)
    if args.shard:
        pipeline.use_mesh()
        print(f'sharded inference over mesh {pipeline.mesh.shape}')

    tone_mapper = None
    if args.tone_mapper != 'none':
        tone_mapper = ToneMapper(args.tone_mapper)
        print(f'Using {args.tone_mapper} tone mapper')

    from renderformer_tpu.io.h5 import (
        VideoSceneDataset, list_scene_files, probe_static_scene)

    files = list_scene_files(args.h5_folder)
    print(f'Found {len(files)} h5 files in {args.h5_folder}')
    if len(files) == 0:
        return 1

    # Static-scene video fast path: upload the scene once, stream only
    # cameras (~100 B/frame instead of ~10^2 MB/frame), render frames as
    # views of the device-resident scene. The reference re-uploads the
    # full scene per frame (/root/reference/batch_infer.py:85-101) —
    # free over PCIe, fatal over a bandwidth-limited device tunnel.
    use_video = False
    if args.video_mode == 'on' and args.shard:
        # explicit request that cannot be honored — fail loudly instead of
        # silently falling back to the slow per-frame path (ADVICE r3)
        parser.error('--video_mode on is incompatible with --shard '
                     '(the device-resident-scene fast path is single-mesh); '
                     'drop --shard or use --video_mode auto/off')
    if args.video_mode != 'off' and not args.shard:
        if args.video_mode == 'on' or probe_static_scene(files):
            use_video = True
    elif args.shard and args.video_mode == 'auto' and len(files) > 1:
        print('NOTICE: --shard disables the static-scene video fast path; '
              'frames render through the sharded per-batch path')
    if args.video_mode == 'auto' and use_video and len(files) > 1:
        print('video mode: static scene detected (frames 0/1 share scene '
              'tensors bitwise); uploading scene once, streaming cameras. '
              'Pass --video_mode off to disable.')

    dataset = None
    if not use_video:
        dataset = SceneFolderDataset(args.h5_folder, args.padding_length)
        if args.batch_size > 1 and args.padding_length is None:
            print('NOTICE: batch_size > 1 requires --padding_length '
                  '(static shapes across frames); falling back to '
                  'batch_size=1 — pass --padding_length to batch frames '
                  'together')
            args.batch_size = 1

    output_dir = args.output_dir or args.h5_folder
    os.makedirs(output_dir, exist_ok=True)
    # ordered video frames, filled by the writer pool
    video_slots = {}

    from renderformer_tpu.utils.profiling import ThroughputMeter
    meter = None
    writer = AsyncWriter(max_workers=max(2, os.cpu_count() or 2))
    frame_counter = 0

    def postprocess(hdr, exr_path, png_path, frame_idx):
        """Tone map + encode + write one view (runs on the writer pool,
        overlapping the next batch's device step — reference overlaps via
        DataLoader workers, batch_infer.py:103-110)."""
        ldr = (tone_mapper.hdr_to_ldr(hdr) if tone_mapper
               else np.clip(hdr, 0, 1))
        ldr_u8 = (ldr * 255).astype(np.uint8)
        write_exr(exr_path, hdr)
        write_png(png_path, ldr_u8)
        if frame_idx is not None:
            video_slots[frame_idx] = ldr_u8

    def flush(rendered_dev, batch):
        """Fetch a finished render and hand its views to the writer pool."""
        nonlocal frame_counter
        rendered = np.asarray(rendered_dev)
        for i, file_path in enumerate(batch['file_paths']):
            base = os.path.splitext(os.path.basename(file_path))[0]
            for view_idx in range(rendered.shape[1]):
                writer.submit(
                    postprocess,
                    rendered[i, view_idx].astype(np.float32),
                    os.path.join(output_dir, f'{base}_view_{view_idx}.exr'),
                    os.path.join(output_dir, f'{base}_view_{view_idx}.png'),
                    frame_counter if args.save_video else None)
                frame_counter += 1
            print(f'Rendered {base}')

    # Three-deep overlap: H5 load + gzip decode prefetches on a background
    # thread, the device renders batch i+1 while batch i's image transfer
    # + EXR/PNG writes drain (jax dispatch is async — `render` returns a
    # future-like device array; `np.asarray` in flush() is the sync point,
    # so keeping one render in flight hides the device->host fetch).
    # Pipelined timing semantics (both paths): window i measures
    # dispatch(i) + host-sync of batch i-1, so per-window time == one
    # batch through the pipeline ONLY in steady state.  The first window
    # is dispatch-only (near zero — summary(warmup=1) drops it) and the
    # last batch's sync lands outside any window; reported rays/s is
    # therefore the steady-state pipelined figure and needs >=3
    # batches to be meaningful (ADVICE r2).
    out_dtype = args.transfer_dtype
    inflight = []
    prev = None

    def sync_or_flush(rendered_dev, payload, flush_fn):
        """Keep one render in flight; in --no_output mode sync without
        fetching (device-throughput measurement).

        The sync is a 1-element fetch, not block_until_ready: over the
        axon device tunnel block_until_ready returns at dispatch-ack,
        before device execution completes — only a data fetch is a true
        completion barrier."""
        nonlocal prev
        if args.no_output:
            if prev is not None:
                np.asarray(prev[0, 0, 0, 0])
            prev = rendered_dev
        else:
            inflight.append((rendered_dev, payload))
            if len(inflight) > 1:
                flush_fn(*inflight.pop(0))

    if use_video:
        import jax
        ds = VideoSceneDataset(args.h5_folder)
        scene = ds.scene
        dev_scene = {k: jax.device_put(np.asarray(scene[k])[None])
                     for k in ('triangles', 'texture', 'mask', 'vn')}

        def flush_video(rendered_dev, chunks):
            """rendered_dev [K, 1, V, H, W, 3]; chunks: K chunk dicts."""
            nonlocal frame_counter
            rendered = np.asarray(rendered_dev)
            for ci, chunk in enumerate(chunks):
                for i, (fp, view_idx) in enumerate(chunk['entries']):
                    base = os.path.splitext(os.path.basename(fp))[0]
                    writer.submit(
                        postprocess,
                        rendered[ci, 0, i].astype(np.float32),
                        os.path.join(output_dir,
                                     f'{base}_view_{view_idx}.exr'),
                        os.path.join(output_dir,
                                     f'{base}_view_{view_idx}.png'),
                        frame_counter if args.save_video else None)
                    frame_counter += 1
                    print(f'Rendered {base}')

        def grouped_chunks(it, k):
            """Group K camera chunks per device program; the final group
            is padded by repeating its last chunk (static K per program —
            no recompile) and padded outputs are dropped (group carries
            only the real chunks)."""
            group = []
            for chunk in it:
                group.append(chunk)
                if len(group) == k:
                    yield group
                    group = []
            if group:
                yield group

        kpc = max(1, args.frames_per_call)
        for group in prefetch(
                grouped_chunks(ds.view_chunks(args.batch_size), kpc),
                depth=2):
            if meter is None:
                meter = ThroughputMeter(
                    resolution=args.resolution,
                    views_per_step=kpc * group[0]['c2w'].shape[1],
                    batch_size=1,
                    triangle_tokens=scene['triangles'].shape[0])
            pad = [group[-1]] * (kpc - len(group))
            c2w_seq = np.stack([c['c2w'] for c in group + pad])
            fov_seq = np.stack([c['fov'][..., None] for c in group + pad])
            meter.start()
            rendered_dev = pipeline.render_many(
                dev_scene['triangles'], dev_scene['texture'],
                dev_scene['mask'], dev_scene['vn'],
                c2w_seq, fov_seq,
                resolution=args.resolution,
                precision=args.precision,
                view_precision=args.view_precision,
                output_dtype=out_dtype,
            )
            sync_or_flush(rendered_dev, group, flush_video)
            meter.stop()
        for item in inflight:
            flush_video(*item)
    else:
        for batch in prefetch(dataset.batches(args.batch_size), depth=2):
            if meter is None:
                meter = ThroughputMeter(
                    resolution=args.resolution,
                    views_per_step=batch['c2w'].shape[1],
                    batch_size=batch['c2w'].shape[0],
                    triangle_tokens=batch['triangles'].shape[1])
            meter.start()
            rendered_dev = pipeline.render(
                triangles=batch['triangles'],
                texture=batch['texture'],
                mask=batch['mask'],
                vn=batch['vn'],
                c2w=batch['c2w'],
                fov=batch['fov'][..., None],
                resolution=args.resolution,
                precision=args.precision,
                view_precision=args.view_precision,
                output_dtype=out_dtype,
            )
            sync_or_flush(rendered_dev, batch, flush)
            meter.stop()
        for item in inflight:
            flush(*item)
    if args.no_output and prev is not None:
        np.asarray(prev[0, 0, 0, 0])

    writer.close()
    video_frames = [video_slots[k] for k in sorted(video_slots)]
    print(f'Output saved to: {output_dir}')
    if meter is not None:
        summary = meter.summary()
        if summary:
            qualifier = ('' if len(meter._times) >= 3 else
                         ', <3 batches: not steady-state')
            print('throughput: %.0f rays/s median / %.0f rays/s mean '
                  '(steady-state pipelined; median %.3fs mean %.3fs per '
                  'batch, first batch excluded; median is robust to the '
                  'one-time weight/scene-upload window%s)' % (
                      summary['rays_per_s_median'], summary['rays_per_s'],
                      summary['median_step_s'], summary['mean_step_s'],
                      qualifier))
    if args.save_video and video_frames:
        video_path = os.path.join(output_dir, 'video.mp4')
        write_video(video_path, video_frames, fps=args.fps)
        print(f'Video saved to: {video_path}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
