"""Multi-host input pipeline (data/multihost.py): per-host file sharding
and globally-sharded batch assembly on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from treemorph_tpu.data import TreeDataset
from treemorph_tpu.data.multihost import (
    global_batch_from_local,
    host_shard_paths,
    multihost_batch_iterator,
)
from treemorph_tpu.data.treeset import make_padded_batch
from treemorph_tpu.fixtures import synthetic_cylinder_cloud
from treemorph_tpu.parallel.mesh import make_mesh


def _write_clouds(tmp_path, n_clouds, points=96):
    paths = []
    for i in range(n_clouds):
        cloud = synthetic_cylinder_cloud(
            points, rng=np.random.default_rng(i)
        ).astype(np.float32)
        p = tmp_path / f"tree_{i:02d}.npy"
        np.save(p, cloud)
        paths.append(str(p))
    return paths


class TestHostShardPaths:
    def test_disjoint_and_covering(self, tmp_path):
        paths = [f"plot_{i}.npy" for i in range(11)]
        shards = [
            host_shard_paths(paths, process_index=p, process_count=4)
            for p in range(4)
        ]
        flat = [p for s in shards for p in s]
        assert sorted(flat) == sorted(paths)  # covering
        assert len(set(flat)) == len(flat)  # disjoint
        # deterministic regardless of input order
        shuffled = list(reversed(paths))
        for p in range(4):
            assert shards[p] == host_shard_paths(
                shuffled, process_index=p, process_count=4
            )

    def test_defaults_to_this_process(self, tmp_path):
        paths = [f"x_{i}.npy" for i in range(5)]
        assert host_shard_paths(paths) == sorted(paths)  # 1 process


class TestGlobalBatchAssembly:
    def test_sharded_values_match_local(self, tmp_path):
        paths = _write_clouds(tmp_path, 8)
        ds = TreeDataset(paths, training=False, process_json=False)
        mesh = make_mesh(8)
        local = make_padded_batch([ds[i] for i in range(8)], bucket=128)
        global_batch = global_batch_from_local(local, mesh)
        # single-process: global == local, sharded over the 8 devices
        np.testing.assert_array_equal(
            np.asarray(global_batch.coords), local.coords
        )
        shards = global_batch.coords.sharding
        assert len(shards.device_set) == 8
        np.testing.assert_array_equal(
            np.asarray(global_batch.semantic_labels), local.semantic_labels
        )

    def test_iterator_yields_full_global_batches(self, tmp_path):
        paths = _write_clouds(tmp_path, 10)
        ds = TreeDataset(paths, training=False, process_json=False)
        mesh = make_mesh(8)
        batches = list(
            multihost_batch_iterator(
                ds, global_batch_size=8, mesh=mesh, bucket=128,
                shuffle=False,
            )
        )
        assert len(batches) == 1  # 10 trees -> one full global batch of 8
        assert batches[0].coords.shape[0] == 8
        assert len(batches[0].coords.sharding.device_set) == 8

    def test_per_host_slices_reassemble_global_permutation(self, tmp_path):
        # simulate 2 hosts in one process: each host's iterator must load
        # exactly its slice of the SHARED permutation, so together they
        # cover the global batch with no overlap
        paths = _write_clouds(tmp_path, 8)
        ds = TreeDataset(paths, training=True, process_json=False)
        mesh = make_mesh(2)  # local slice = 2 rows -> 2-device mesh
        rng = np.random.default_rng(7)
        order = np.arange(len(ds))
        rng.shuffle(order)
        for p in range(2):
            it = multihost_batch_iterator(
                ds, global_batch_size=4, mesh=mesh, bucket=128,
                seed=7, shuffle=True,
                process_index=p, process_count=2,
            )
            got = next(it)
            want = make_padded_batch(
                [ds[j] for j in order[p * 2 : (p + 1) * 2]], bucket=128
            )
            np.testing.assert_array_equal(
                np.asarray(got.coords), want.coords
            )


class TestCrossHostShapeAgreement:
    def test_hosts_with_different_tree_sizes_pad_identically(
        self, tmp_path
    ):
        """Each host pads to the GLOBAL batch's max (read from npy
        headers) — independent local padding would give the processes
        mismatched global shapes and mismatched SPMD programs."""
        from treemorph_tpu.fixtures import synthetic_cylinder_cloud

        paths = []
        # deliberately different sizes: host 0's slice stays <=1024 pts,
        # host 1's slice contains a bigger tree
        for i, n in enumerate((200, 300, 1500, 400)):
            cloud = synthetic_cylinder_cloud(
                n, rng=np.random.default_rng(i)
            ).astype(np.float32)
            p = tmp_path / f"tree_{i:02d}.npy"
            np.save(p, cloud)
            paths.append(str(p))
        ds = TreeDataset(paths, training=False, process_json=False)
        mesh = make_mesh(2)
        shapes = []
        for proc in range(2):
            it = multihost_batch_iterator(
                ds, global_batch_size=4, mesh=mesh, bucket=256,
                shuffle=False, process_index=proc, process_count=2,
            )
            batch = next(it)
            shapes.append(batch.coords.shape)
        assert shapes[0] == shapes[1]
        assert shapes[0][1] >= 1500  # covers the global max
