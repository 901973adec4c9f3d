"""Domain-decomposition tests: partition invariants and sharded-vs-unsharded
equivalence on 8 virtual CPU devices (SURVEY.md section 4: 'allclose
comparisons of sharded vs unsharded runs')."""

import dataclasses

import jax
import numpy as np
import pytest

from mpas_tpu.parallel import partition as P


@pytest.fixture(scope="module")
def part(mesh):
    return P.build_partition(mesh, 8)


def test_every_cell_owned_once(mesh, part):
    owned = np.zeros(mesh.nCells)
    for s in range(8):
        sel = part.cell_owned_mask[s] > 0
        np.add.at(owned, part.cell_l2g[s][sel], 1)
    np.testing.assert_array_equal(owned, 1.0)


def test_every_edge_and_vertex_owned_once(mesh, part):
    for l2g, om, N in [(part.edge_l2g, part.edge_owned_mask, mesh.nEdges),
                       (part.vertex_l2g, part.vertex_owned_mask, mesh.nVertices)]:
        owned = np.zeros(N)
        for s in range(8):
            sel = om[s] > 0
            np.add.at(owned, l2g[s][sel], 1)
        np.testing.assert_array_equal(owned, 1.0)


def test_halo_covers_two_rings(mesh, part):
    """Every owned cell's 2-ring advection stencil is locally resident."""
    for s in range(3):
        local = set(part.cell_l2g[s][part.cell_mask[s] > 0].tolist())
        owned = part.cell_l2g[s][part.cell_owned_mask[s] > 0]
        ring1 = mesh.cellsOnCell[owned][mesh.edgesOnCell_mask[owned] > 0]
        ring2 = mesh.cellsOnCell[ring1][mesh.edgesOnCell_mask[ring1] > 0]
        assert set(ring1.tolist()) <= local
        assert set(ring2.tolist()) <= local


def test_exchange_tables_consistent(part):
    """recv positions point at slots the owner actually sends."""
    x = part.cell_x
    S = part.n_shards
    for s in range(S):
        halo = np.nonzero(x.recv_is_halo[s] > 0)[0]
        for slot in halo[:50]:
            pos = x.recv_pos[s, slot]
            d, p = divmod(pos, x.max_send)
            # the owner d sends its local index of this global cell to s
            g = part.cell_l2g[s, slot]
            sent_local = x.send_idx[d, s, p]
            assert part.cell_l2g[d, sent_local] == g
            assert x.send_mask[d, s, p] == 1.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_unsharded(model):
    from mpas_tpu.parallel.sharded import shard_model
    sm = shard_model(model, 8)
    S_ref = model.state
    for _ in range(2):
        S_ref = model.step_fn(S_ref)
    sm.step(2)
    g = sm.gather_state(model.mesh)
    for name in ["u", "w", "theta_m", "rho_zz", "rtheta_p"]:
        a = np.asarray(getattr(S_ref, name))
        b = g[name]
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-11, name


def test_ppermute_schedule_covers_all_sends(part):
    """Every (owner, receiver) message appears in exactly one ppermute round,
    and within a round each shard sends/receives at most once."""
    x = part.cell_x
    assert x.rounds
    covered = {}
    for r, rnd in enumerate(x.rounds):
        srcs = [p[0] for p in rnd["perm"]]
        dsts = [p[1] for p in rnd["perm"]]
        assert len(set(srcs)) == len(srcs)
        assert len(set(dsts)) == len(dsts)
        for d, s in rnd["perm"]:
            assert (d, s) not in covered
            covered[(d, s)] = r
    # the all-pairs table's nonzero messages == the scheduled pairs
    S = part.n_shards
    for d in range(S):
        for s in range(S):
            has_msg = x.send_mask[d, s].sum() > 0
            assert has_msg == ((d, s) in covered)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ppermute_matches_all_to_all(model):
    """The neighbor-only ppermute exchange matches the all-pairs all_to_all
    exchange (the refreshed halos are bitwise identical; the full step is
    allclose because the two programs compile with different fusion orders)."""
    from mpas_tpu.parallel.sharded import shard_model
    sm_pp = shard_model(model, 8)
    nl_a2a = model.namelist.replace(config_halo_exchange="all_to_all")
    m2 = dataclasses.replace(model, namelist=nl_a2a)
    sm_a2a = shard_model(m2, 8)
    sm_pp.step(2)
    sm_a2a.step(2)
    g1 = sm_pp.gather_state(model.mesh)
    g2 = sm_a2a.gather_state(model.mesh)
    for name in ["u", "w", "theta_m", "rho_zz"]:
        scale = np.abs(g1[name]).max() + 1e-30
        assert np.abs(g1[name] - g2[name]).max() / scale < 1e-12, name


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_collective_count_packed(model):
    """Communication placement (round 4): fields sharing an entity type pack
    into ONE buffer per exchange, tendencies are exchanged once per RK stage,
    and the acoustic loop runs with ZERO collectives (redundant ring compute).
    Per dry step: cell/edge exchanges = 1 step-top + 2 stage-top + 3 tend = 6
    each, vs the round-3 scheme's 40 cell + 10 edge field-exchanges (one
    collective PER FIELD: 3 state refreshes x (8 cell + 2 edge) + 4 acoustic
    refreshes x (4 cell + 1 edge)) — a ~4x collective-count reduction with
    none left inside the acoustic loop."""
    from mpas_tpu.parallel.sharded import shard_model
    sm = shard_model(model, 8)
    lowered = jax.jit(sm.step_fn).lower(sm.state).as_text()
    n_cp = lowered.count("collective_permute")
    R_c = len(sm.tables.cell.rounds)
    R_e = len(sm.tables.edge.rounds)
    assert R_c > 0 and R_e > 0
    expected = 6 * R_c + 6 * R_e
    assert n_cp == expected, (n_cp, expected, R_c, R_e)
    round3_count = 40 * R_c + 10 * R_e
    assert n_cp <= round3_count / 3.5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_jitted_summarize_matches_host_oracle(model):
    """The in-program pmin/pmax/psum summarize (the TPU-native replacement
    for the reference's stubbed mpas_dmpar_* reductions,
    rk_timestep.rg:207-210) matches the host-numpy masked reduction."""
    from mpas_tpu.parallel.sharded import (host_summarize_oracle, shard_model,
                                           sharded_summarize)
    sm = shard_model(model, 8)
    sm.step(1)
    a = sharded_summarize(sm)
    b = host_summarize_oracle(sm)
    assert a["nan_detected"] == b["nan_detected"] == False  # noqa: E712
    for k in ("w_min", "w_max", "u_min", "u_max", "wsp_max",
              "theta_min", "theta_max"):
        np.testing.assert_allclose(a[k], b[k], rtol=1e-12, err_msg=k)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_physics_matches_single_device(model):
    """The shard_map'd radiation (columnar, zero collectives) produces the
    same rt_diabatic_tend as the single-device jitted path (the physics
    shards-gate removal, VERDICT item 6)."""
    from mpas_tpu.parallel.sharded import shard_model
    from mpas_tpu.physics.driver import physics_init
    import copy
    phys = physics_init()
    m = copy.copy(model)         # do not mutate the session fixture's state
    sm = shard_model(m, 8)
    sm.enable_physics(phys)
    sm.apply_physics(phys, julian=80.25)
    m.apply_physics(phys, julian=80.25)
    g = sm.gather_state(m.mesh)
    a = np.asarray(m.state.rt_diabatic_tend)
    b = g["rt_diabatic_tend"]
    scale = np.abs(a).max() + 1e-30
    assert np.abs(a - b).max() / scale < 1e-10, np.abs(a - b).max() / scale


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_checkpoint_roundtrip(model, tmp_path):
    """Sharded save_restart/load_restart round-trips bitwise with the same
    shard count and refuses a mismatched one."""
    from mpas_tpu.io.history import load_restart, save_restart
    from mpas_tpu.parallel.sharded import shard_model
    sm = shard_model(model, 8)
    sm.step(1)
    path = str(tmp_path / "ck.npz")
    save_restart(path, sm)
    w_ref = np.asarray(sm.state.w).copy()
    sm.step(1)
    load_restart(path, sm)
    np.testing.assert_array_equal(np.asarray(sm.state.w), w_ref)
    assert sm.step_count == 1
    with pytest.raises(ValueError):
        load_restart(path, model)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_moist_wsm6_matches_single_device():
    """The FULL moist program — FCT scalar transport + 6-class WSM6
    graupel microphysics + YSU-lite PBL inside the sharded SRK3 step —
    reproduces the single-device trajectory (f64, 3 steps).  Covers the
    shard_map varying-axes carries of the sedimentation/tridiagonal loops
    (round-5 fix) at pytest level, not just through the driver dryrun."""
    import copy

    from mpas_tpu.config import Namelist
    from mpas_tpu.dynamics.model import build_model
    from mpas_tpu.mesh.generator import generate_mesh
    from mpas_tpu.parallel.sharded import shard_model

    nl = Namelist(config_nvertlevels=10, config_ztop=30000.0,
                  dtype="float64", config_dt=480.0, config_moisture=True,
                  config_microphysics="wsm6", config_pbl="ysu_lite",
                  config_jw_u_perturbation=1.0)
    mesh = generate_mesh(levels=3, lloyd_iterations=3)
    m = build_model(namelist=nl, mesh=mesh)
    assert m.state.scalars.shape[0] == 6
    sm = shard_model(copy.copy(m), 8)
    sm.step(3)
    s = m.state
    for _ in range(3):
        s = m.step_fn(s)
    g = sm.gather_state(m.mesh)
    for name in ("u", "w", "theta_m", "rho_zz", "scalars", "rainnc"):
        a = np.asarray(getattr(s, name))
        scale = np.abs(a).max() + 1e-30
        err = np.abs(a - g[name]).max() / scale
        # f64 reassociation roundoff through 3 steps of the full moist
        # chain (FCT + WSM6 + PBL tridiagonals); a sharding bug shows O(1)
        assert err < 1e-10, (name, err)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_orbax_checkpoint_roundtrip(model, tmp_path):
    """The orbax (tensorstore/zarr) checkpoint round-trips a sharded model
    bitwise, with the same shard-count validation as npz."""
    from mpas_tpu.io.history import load_restart_orbax, save_restart_orbax
    from mpas_tpu.parallel.sharded import shard_model
    sm = shard_model(model, 8)
    sm.step(1)
    path = str(tmp_path / "ck_orbax")
    save_restart_orbax(path, sm)
    w_ref = np.asarray(sm.state.w).copy()
    sm.step(1)
    load_restart_orbax(path, sm)
    np.testing.assert_array_equal(np.asarray(sm.state.w), w_ref)
    assert sm.step_count == 1
    with pytest.raises(ValueError):
        load_restart_orbax(path, model)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_history_write(model, tmp_path):
    """History output from a sharded run: gathered owned entries match the
    single-device fields (step 0: identical states)."""
    from mpas_tpu.io.history import gathered_state, write_history
    from mpas_tpu.mesh.netcdf_io import read_netcdf
    from mpas_tpu.parallel.sharded import shard_model
    sm = shard_model(model, 8)
    p1 = str(tmp_path / "sharded.nc")
    p2 = str(tmp_path / "single.nc")
    write_history(p1, model, state=gathered_state(sm, model))
    write_history(p2, model)
    d1 = read_netcdf(p1)
    d2 = read_netcdf(p2)
    for name in ("u", "w", "theta", "surface_pressure"):
        np.testing.assert_allclose(d1[name], d2[name], rtol=1e-12)


def test_native_partition_matches_numpy(mesh):
    """The C++ grow_rings/incident_entities kernels produce identical
    partitions to the numpy path (VERDICT item 8: native kernels wired into
    build_partition for production meshes)."""
    from mpas_tpu.parallel import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    a = P.build_partition(mesh, 8, use_native=False)
    b = P.build_partition(mesh, 8, use_native=True)
    for name in ("cell_l2g", "cell_mask", "cell_owned_mask",
                 "edge_l2g", "edge_owned_mask",
                 "vertex_l2g", "vertex_owned_mask"):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name), name)
