"""Generate the in-repo example assets: template backgrounds, a light
triangle, sample object meshes, and Cornell-box-style scene JSONs.

Produces the same *kind* of content as the reference examples/ directory
(cbox family with wall/plane backgrounds and a single-triangle light)
from first principles, so the repo is self-contained.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from renderformer_tpu.scene.mesh import Mesh, save_obj  # noqa: E402
from create_sample_meshes import (  # noqa: E402
    create_cube_mesh, create_sphere_mesh, create_torus_mesh)


def grid_plane(n: int = 8) -> Mesh:
    """Unit plane [-1,1]^2 at z=-1 subdivided into 2*n*n triangles
    (the reference backgrounds are subdivided so per-triangle radiosity
    has resolution)."""
    lin = np.linspace(-1, 1, n + 1)
    xx, yy = np.meshgrid(lin, lin, indexing='ij')
    verts = np.stack([xx.ravel(), yy.ravel(), np.full((n + 1) ** 2, -1.0)],
                     axis=1)
    faces = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b = a + 1
            c = a + (n + 1)
            d = c + 1
            faces += [[a, b, c], [b, d, c]]
    return Mesh(verts, np.asarray(faces))


def wall(axis: str, sign: float, n: int = 8) -> Mesh:
    """Axis-aligned wall of the +-1 box, normal pointing inward."""
    m = grid_plane(n)
    v = m.vertices.copy()
    # grid_plane's constant coordinate is z = -1; re-map it onto the
    # requested axis at coordinate `sign`
    if axis == 'x':
        v = v[:, [2, 0, 1]] * np.array([-sign, 1, 1])
    elif axis == 'y':
        v = v[:, [0, 2, 1]] * np.array([1, -sign, 1])
    else:
        v = v * np.array([1, 1, -sign])
    m.vertices = v
    # ensure faces wind toward the box center
    center_dir = -v.mean(axis=0)
    if (m.face_normals() @ center_dir).mean() < 0:
        m.faces = m.faces[:, ::-1]
    return m


def light_tri() -> Mesh:
    """Single downward-facing triangle light (templates/lighting/tri.obj
    equivalent: 1 face)."""
    v = np.array([[-0.05, -0.029, 0.0], [0.05, -0.029, 0.0],
                  [0.0, 0.058, 0.0]])
    return Mesh(v, np.array([[0, 2, 1]]))


def material(diffuse, specular=(0.01, 0.01, 0.01), roughness=0.99,
             emissive=(0.0, 0.0, 0.0), smooth=True):
    return {'diffuse': list(diffuse), 'specular': list(specular),
            'roughness': roughness, 'emissive': list(emissive),
            'smooth_shading': smooth, 'rand_tri_diffuse_seed': None,
            'random_diffuse_max': 0.0}


def obj_entry(mesh_path, mat, translation=(0, 0, 0), rotation=(0, 0, 0),
              scale=(0.5, 0.5, 0.5), normalize=False, remesh=False,
              remesh_faces=2048):
    return {'mesh_path': mesh_path, 'material': mat,
            'transform': {'translation': list(translation),
                          'rotation': list(rotation),
                          'scale': list(scale), 'normalize': normalize},
            'remesh': remesh, 'remesh_target_face_num': remesh_faces}


def cbox_scene(name: str, object_mesh: str, obj_kw=None) -> dict:
    objects = {
        'floor': obj_entry('templates/backgrounds/plane.obj',
                           material([0.4, 0.4, 0.4])),
        'back_wall': obj_entry('templates/backgrounds/wall_back.obj',
                               material([0.4, 0.4, 0.4])),
        'left_wall': obj_entry('templates/backgrounds/wall_left.obj',
                               material([0.4, 0.1, 0.1])),
        'right_wall': obj_entry('templates/backgrounds/wall_right.obj',
                                material([0.1, 0.4, 0.1])),
        'main_object': obj_entry(
            object_mesh,
            material([0.6, 0.5, 0.4], specular=[0.3, 0.3, 0.3],
                     roughness=0.4),
            translation=(0, 0, -0.2), scale=(0.45, 0.45, 0.45),
            normalize=True, **(obj_kw or {})),
        'light_0': obj_entry(
            'templates/lighting/tri.obj',
            material([1, 1, 1], specular=[0, 0, 0], roughness=1.0,
                     emissive=[4000.0, 4000.0, 4000.0]),
            translation=(0, 0, 2.2), scale=(2.5, 2.5, 2.5)),
    }
    return {
        'scene_name': name, 'version': '1.0', 'objects': objects,
        'cameras': [{'position': [0.0, -1.8, 0.2], 'look_at': [0, 0, 0],
                     'up': [0, 0, 1], 'fov': 39.0}],
    }


def main():
    out = 'examples'
    os.makedirs(f'{out}/templates/backgrounds', exist_ok=True)
    os.makedirs(f'{out}/templates/lighting', exist_ok=True)
    os.makedirs(f'{out}/objects', exist_ok=True)

    save_obj(f'{out}/templates/backgrounds/plane.obj', grid_plane())
    save_obj(f'{out}/templates/backgrounds/wall_back.obj', wall('y', 1))
    save_obj(f'{out}/templates/backgrounds/wall_left.obj', wall('x', -1))
    save_obj(f'{out}/templates/backgrounds/wall_right.obj', wall('x', 1))
    save_obj(f'{out}/templates/lighting/tri.obj', light_tri())

    save_obj(f'{out}/objects/cube.obj', create_cube_mesh())
    save_obj(f'{out}/objects/sphere.obj', create_sphere_mesh(subdivisions=3))
    save_obj(f'{out}/objects/torus.obj', create_torus_mesh(segments=24))

    scenes = {
        'cbox': cbox_scene('cornell box', 'objects/cube.obj'),
        'cbox-sphere': cbox_scene('cbox sphere', 'objects/sphere.obj'),
        'cbox-torus': cbox_scene('cbox torus', 'objects/torus.obj'),
    }
    for name, scene in scenes.items():
        with open(f'{out}/{name}.json', 'w') as f:
            json.dump(scene, f, indent=2)
        print(f'wrote {out}/{name}.json')


if __name__ == '__main__':
    main()
