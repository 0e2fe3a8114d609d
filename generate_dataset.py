"""Random-scene dataset generator (Cornell-box variations).

Parity with /root/reference/generate_dataset.py:13-479: randomized
object pose / roughness / light height / fov inside a Cornell-box
template, asyncio semaphore-bounded fan-out, JSON + H5 saves, and a GT
render per scene.

GT sources (``--gt_mode``) — the reference only supports Blender
(generate_dataset.py:342-386); this generator adds two in-framework
sources so the dataset -> train loop is executable WITHOUT Blender:

  * ``blender`` — blenderproc path-trace subprocess (reference parity),
    tolerated-with-warning when not installed;
  * ``model``   — render GT with this framework's own pipeline in fp32
    (``--gt_preset``/``--gt_checkpoint`` pick the weights): the
    self-distillation / overfit-recovery data source used by the
    convergence tests;
  * ``raster``  — the software debug rasterizer (render_h5_to_png.py):
    geometry-faithful flat-shaded images, no ML weights involved;
  * ``pathtrace`` — the TPU-native Monte-Carlo path tracer
    (renderformer_tpu/scene/path_tracer.py): physically-based GT (area
    lights, NEE, diffuse interreflection) with no external dependency —
    the in-framework equivalent of the reference's Blender GT
    (``--gt_spp`` controls quality);
  * ``none``    — scenes only;
  * ``auto``    — blender when available, else raster.
"""

import asyncio
import glob
import json
import os
import random
import shutil
import sys
from pathlib import Path
from typing import Dict, List

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CONFIG = {
    'DATA_PATH': 'datasets',
    'JSON_PATH': 'datasets/json',
    'H5_PATH': 'datasets/h5',
    'GT_PATH': 'datasets/gt',
    'OBJ_PATH': 'examples/objects',
    'BASE_DIR': 'examples',
    'SCRIPT_NAME': 'render_scene.py',
    'NUM_RANDOM_SCENES': 10,
    'MAX_CONCURRENT_TASKS': 4,
    'GT_MODE': 'auto',          # blender | model | raster | none | auto
    'GT_RESOLUTION': 256,
    'GT_PRESET': 'v1-base',     # for GT_MODE=model
    'GT_CHECKPOINT': None,      # orbax checkpoint dir; None -> seeded init
    'GT_SEED': 0,
}


def _bg(mesh: str, diffuse, emissive=(0.0, 0.0, 0.0)) -> Dict:
    return {
        'mesh_path': mesh,
        'transform': {'translation': [0.0, 0.0, 0.0],
                      'rotation': [0.0, 0.0, 0.0],
                      'scale': [0.5, 0.5, 0.5], 'normalize': False},
        'material': {'diffuse': list(diffuse),
                     'specular': [0.01, 0.01, 0.01],
                     'random_diffuse_max': 0.4, 'roughness': 0.99,
                     'emissive': list(emissive), 'smooth_shading': True,
                     'rand_tri_diffuse_seed': None},
    }


class SceneGenerator:
    def __init__(self, config: dict):
        self.config = config
        self.objects_path = Path(config['OBJ_PATH'])
        self.json_path = Path(config['JSON_PATH'])
        self.h5_path = Path(config['H5_PATH'])
        self.gt_path = Path(config['GT_PATH'])
        for p in (self.json_path, self.h5_path, self.gt_path):
            p.mkdir(parents=True, exist_ok=True)
        self.available_objects = self._collect_objects()
        mode = config.get('GT_MODE', 'auto')
        if mode == 'auto':
            mode = 'blender' if shutil.which('blenderproc') else 'raster'
        self.gt_mode = mode

    def _collect_objects(self) -> List[tuple]:
        objects = []
        for obj_file in glob.glob(str(self.objects_path / '**/*.obj'),
                                  recursive=True):
            rel = os.path.relpath(obj_file, str(self.objects_path))
            objects.append((Path(rel).stem, rel))
        return objects

    # ------------------------------------------------------------------
    def generate_scene(self, scene_name: str, object_name: str,
                       object_path: str) -> Dict:
        """Randomized Cornell-box scene (generate_dataset.py:50-340):
        random object pose/scale/roughness, light height 1.5-2.5,
        fov 30-60 deg."""
        base = self.config['BASE_DIR']
        return {
            'scene_name': scene_name,
            'version': '1.0',
            'objects': {
                'background_0': _bg(f'{base}/templates/backgrounds/plane.obj',
                                    [0.4, 0.4, 0.4]),
                'background_1': _bg(f'{base}/templates/backgrounds/wall0.obj',
                                    [0.4, 0.4, 0.4]),
                'background_2': _bg(f'{base}/templates/backgrounds/wall1.obj',
                                    [0.1, 0.4, 0.1]),
                'background_3': _bg(f'{base}/templates/backgrounds/wall2.obj',
                                    [0.4, 0.1, 0.1]),
                'object_0': {
                    'mesh_path': f'{self.config["OBJ_PATH"]}/{object_path}',
                    'transform': {
                        'translation': [random.uniform(-0.3, 0.3),
                                        random.uniform(-0.3, 0.3),
                                        random.uniform(-0.3, 0.3)],
                        'rotation': [random.uniform(0, 360) for _ in range(3)],
                        'scale': [random.uniform(0.4, 0.8) for _ in range(3)],
                        'normalize': True,
                    },
                    'material': {
                        'diffuse': [0.5, 0.5, 0.5],
                        'specular': [0.5, 0.5, 0.5],
                        'random_diffuse_max': 0.5,
                        'roughness': random.uniform(0.001, 1.0),
                        'emissive': [0.0, 0.0, 0.0],
                        'smooth_shading': True,
                        'rand_tri_diffuse_seed': random.randint(0, 2 ** 31),
                    },
                },
                'light_0': {
                    'mesh_path': f'{base}/templates/lighting/tri.obj',
                    'transform': {
                        'translation': [0.0, 0.0, random.uniform(1.5, 2.5)],
                        'rotation': [0.0, 0.0, 0.0],
                        'scale': [2.5, 2.5, 2.5],
                        'normalize': False,
                    },
                    'material': {
                        'diffuse': [1.0, 1.0, 1.0],
                        'specular': [0.0, 0.0, 0.0],
                        'random_diffuse_max': 0.0,
                        'roughness': 1.0,
                        'emissive': [5000.0, 5000.0, 5000.0],
                        'smooth_shading': True,
                        'rand_tri_diffuse_seed': None,
                    },
                },
            },
            'cameras': [{
                'position': [0.0, -2.0, 0.0],
                'look_at': [0.0, 0.0, 0.0],
                'up': [0.0, 0.0, 1.0],
                'fov': random.uniform(30, 60),
            }],
        }

    # ------------------------------------------------------------------
    async def save_scene_async(self, scene: Dict, scene_name: str):
        json_file = self.json_path / f'{scene_name}.json'
        with open(json_file, 'w') as f:
            json.dump(scene, f, indent=4)

        try:
            from renderformer_tpu.scene.h5_tools import (
                save_dict_to_h5_renderformer_method)
            h5_file = self.h5_path / f'{scene_name}.h5'
            save_dict_to_h5_renderformer_method(scene, str(h5_file))

            # GT path-trace via blenderproc, tolerated if unavailable;
            # model/raster GT modes render in a single batch pass after
            # generation (render_gt_batch)
            if self.gt_mode == 'blender':
                if shutil.which('blenderproc'):
                    script = (Path(__file__).parent / 'renderformer_tpu'
                              / 'scene' / self.config['SCRIPT_NAME'])
                    cmd = (f'blenderproc run {script} -j {json_file} '
                           f'-o {self.gt_path} -i {scene_name}.png')
                    proc = await asyncio.create_subprocess_shell(
                        cmd, stdout=asyncio.subprocess.PIPE,
                        stderr=asyncio.subprocess.PIPE)
                    _, stderr = await proc.communicate()
                    if proc.returncode != 0:
                        print(f'Warning: GT render failed for {scene_name}: '
                              f'{stderr.decode()[:500]}')
                else:
                    print(f'Warning: blenderproc not available; no GT for '
                          f'{scene_name} (scene JSON/H5 still written; use '
                          f'--gt_mode model|raster for an in-framework GT)')
            print(f'Generated scene {scene_name}')
        except Exception as e:
            print(f'Error converting {scene_name}: {e} '
                  f'(JSON kept at {json_file})')

    async def _generate_scene_task(self, scene_index: int):
        obj_name, obj_path = random.choice(self.available_objects)
        name = f'random_scene_{scene_index}_{obj_name}'
        scene = self.generate_scene(name, obj_name, obj_path)
        await self.save_scene_async(scene, name)
        return scene_index

    async def generate_dataset(self):
        sem = asyncio.Semaphore(self.config['MAX_CONCURRENT_TASKS'])

        async def limited(i):
            async with sem:
                return await self._generate_scene_task(i)

        results = await asyncio.gather(
            *[limited(i) for i in range(self.config['NUM_RANDOM_SCENES'])],
            return_exceptions=True)
        ok = sum(1 for r in results if not isinstance(r, Exception))
        print(f'Dataset generation completed: {ok} successful, '
              f'{len(results) - ok} failed')

    def generate_dataset_sync(self):
        asyncio.run(self.generate_dataset())
        self.render_gt_batch()

    # ------------------------------------------------------------------
    def render_gt_batch(self):
        """Render GT PNGs for every generated H5 with the configured
        in-framework source (gt_mode 'model' or 'raster').

        Runs AFTER scene generation in one pass so 'model' compiles the
        render once and streams scenes through it (the reference's
        per-scene Blender subprocess has no compile to amortize)."""
        if self.gt_mode not in ('model', 'raster', 'pathtrace'):
            return
        import numpy as np
        import imageio

        h5_files = sorted(glob.glob(str(self.h5_path / '*.h5')))
        if not h5_files:
            return
        res = int(self.config.get('GT_RESOLUTION', 256))

        if self.gt_mode == 'pathtrace':
            # physically-based GT from the TPU-native path tracer
            # (scene/path_tracer.py) — the in-framework equivalent of the
            # reference's Blender path-traced GT, with no external
            # dependency; jit-compiled once, scenes stream through.
            from renderformer_tpu.io.h5 import load_scene_h5
            from renderformer_tpu.scene.path_tracer import (
                render_scene_pathtrace)
            spp = int(self.config.get('GT_SPP', 64))
            # one shared padding bucket -> one compile for the whole set
            import h5py
            counts = []
            for f in h5_files:
                with h5py.File(f, 'r') as h:
                    counts.append(h['triangles'].shape[0])
            bucket = int(-(-max(counts) // 512) * 512)
            for f in h5_files:
                data = load_scene_h5(f, padding_length=bucket)
                # clamp=10: firefly suppression for LDR-clipped GT
                # (slightly biased; raw HDR users call path_trace direct)
                img = render_scene_pathtrace(
                    data, view=0, resolution=res, spp=spp,
                    seed=int(self.config.get('GT_SEED', 0)), clamp=10.0)
                name = Path(f).stem
                imageio.v3.imwrite(
                    str(self.gt_path / f'{name}.png'),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8))
                print(f'GT (pathtrace spp={spp}) {name}.png')
            return

        if self.gt_mode == 'raster':
            from render_h5_to_png import debug_render
            from renderformer_tpu.io.h5 import load_scene_h5
            for f in h5_files:
                data = load_scene_h5(f)
                img = debug_render(data, view=0, resolution=res)
                name = Path(f).stem
                imageio.v3.imwrite(
                    str(self.gt_path / f'{name}.png'),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8))
                print(f'GT (raster) {name}.png')
            return

        # gt_mode == 'model': fp32 render through the full pipeline
        import jax
        from renderformer_tpu.config import PRESETS, RenderFormerConfig
        from renderformer_tpu.models.renderformer import RenderFormer
        from renderformer_tpu.pipelines.rendering_pipeline import (
            RenderingPipeline)
        from renderformer_tpu.io.h5 import load_scene_h5

        ckpt = self.config.get('GT_CHECKPOINT')
        if ckpt:
            # any local checkpoint dir (export_params / converted torch)
            pipe = RenderingPipeline.from_pretrained(ckpt)
        else:
            preset = self.config.get('GT_PRESET', 'v1-base')
            if preset == 'tiny':  # CI-scale GT source
                cfg = RenderFormerConfig(
                    latent_dim=72, num_layers=2, num_heads=2,
                    dim_feedforward=144, num_register_tokens=4,
                    vertex_pe_num_freqs=4, view_transformer_latent_dim=72,
                    view_transformer_ffn_hidden_dim=144,
                    view_transformer_n_heads=2, view_transformer_n_layers=4,
                    dpt_features=16, dpt_out_channels=[8, 16, 32, 64])
            else:
                cfg = PRESETS[preset]
            model = RenderFormer(cfg)
            params = model.init(
                jax.random.key(int(self.config.get('GT_SEED', 0))))
            pipe = RenderingPipeline(model, params)
        for f in h5_files:
            data = load_scene_h5(f)
            imgs = np.asarray(pipe.render(
                data['triangles'][None], data['texture'][None],
                data['mask'][None], data['vn'][None],
                data['c2w'][None], data['fov'][None, :, None],
                resolution=res, precision='fp32', view_precision='fp32'))
            name = Path(f).stem
            imageio.v3.imwrite(
                str(self.gt_path / f'{name}.png'),
                (np.clip(imgs[0, 0], 0, 1) * 255).astype(np.uint8))
            print(f'GT (model/{preset}) {name}.png')


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--data_path', default=None,
                    help='dataset root (json/h5/gt subdirs)')
    ap.add_argument('--num_scenes', type=int,
                    default=CONFIG['NUM_RANDOM_SCENES'])
    ap.add_argument('--obj_path', default=None)
    ap.add_argument('--gt_mode', default=CONFIG['GT_MODE'],
                    choices=['blender', 'model', 'raster', 'pathtrace', 'none',
                             'auto'])
    ap.add_argument('--gt_resolution', type=int,
                    default=CONFIG['GT_RESOLUTION'])
    ap.add_argument('--gt_preset', default=CONFIG['GT_PRESET'],
                    help="'tiny' | 'v1-base' | 'v1.1-swin-large' "
                         '(gt_mode=model)')
    ap.add_argument('--gt_checkpoint', default=None,
                    help='local checkpoint dir for gt_mode=model')
    ap.add_argument('--gt_spp', type=int, default=64,
                    help='samples per pixel (gt_mode=pathtrace)')
    ap.add_argument('--gt_seed', type=int, default=0,
                    help='weight-init seed for gt_mode=model / RNG '
                         'seed for gt_mode=pathtrace')
    ap.add_argument('--seed', type=int, default=None,
                    help='scene randomization seed')
    args = ap.parse_args(argv)

    if args.data_path:
        CONFIG['DATA_PATH'] = args.data_path
        CONFIG['JSON_PATH'] = os.path.join(args.data_path, 'json')
        CONFIG['H5_PATH'] = os.path.join(args.data_path, 'h5')
        CONFIG['GT_PATH'] = os.path.join(args.data_path, 'gt')
    if args.obj_path:
        CONFIG['OBJ_PATH'] = args.obj_path
    CONFIG['NUM_RANDOM_SCENES'] = args.num_scenes
    CONFIG['GT_MODE'] = args.gt_mode
    CONFIG['GT_RESOLUTION'] = args.gt_resolution
    CONFIG['GT_PRESET'] = args.gt_preset
    CONFIG['GT_CHECKPOINT'] = args.gt_checkpoint
    CONFIG['GT_SPP'] = args.gt_spp
    CONFIG['GT_SEED'] = args.gt_seed
    if args.seed is not None:
        random.seed(args.seed)
        CONFIG['GT_SEED'] = args.seed

    if not os.path.isdir(CONFIG['OBJ_PATH']):
        # fall back to the reference's example objects when present
        ref = '/root/reference/examples'
        if os.path.isdir(os.path.join(ref, 'objects')):
            CONFIG['OBJ_PATH'] = os.path.join(ref, 'objects')
            CONFIG['BASE_DIR'] = ref
    gen = SceneGenerator(CONFIG)
    if not gen.available_objects:
        print(f'no .obj files under {CONFIG["OBJ_PATH"]}')
        return 1
    gen.generate_dataset_sync()
    return 0


if __name__ == '__main__':
    sys.exit(main())
