"""Multi-UE capstone: 2 UEs x 1 eNB, every PDU over waveforms
(VERDICT r3 missing #5 — oaisim.c:760-938 full-PHY mode with the whole
protocol stack, channel_sim.c sample-level coupling)."""
from openair4g_tpu.sim.capstone_multiue import MultiUeSim
from openair4g_tpu.sim.capstone import CapstoneConfig
from openair4g_tpu.utils.opt import read_pcap, KIND_MAC, KIND_IP, \
    DIR_DL, DIR_UL


def test_two_ues_full_phy_attach(tmp_path):
    """Both UEs: PSS/SSS/PBCH camp -> summed-PRACH -> RAR -> Msg3 ->
    contention resolution -> RRC+NAS attach -> DRB -> IP echo, with DL
    broadcast waves received independently and UL subframes sharing TTIs
    on disjoint PRBs (FDM over the summed air signal)."""
    sim = MultiUeSim(CapstoneConfig(snr_db=12.0, seed=0, max_ttis=400),
                     n_ues=2, artifact_dir=str(tmp_path))
    res = sim.run()
    assert res["registered"] == [True, True]
    assert res["echo_ok"] == [True, True]
    assert res["crntis"][0] != res["crntis"][1]
    assert res["fdm_ul_ttis"] >= 1          # 2 PUSCH in one TTI, summed
    # distinct MME contexts
    assert len(sim.mme.ues) == 2
    # artifacts
    recs = read_pcap(str(tmp_path / "capstone_multiue.pcap"))
    assert len(recs) >= 10
    kinds = {(k, d) for _, k, d, _, _ in recs}
    assert (KIND_MAC, DIR_UL) in kinds and (KIND_MAC, DIR_DL) in kinds
    msc = (tmp_path / "capstone_multiue.msc").read_text()
    for label in ("PRACH", "RAR", "Msg3", "SecurityModeCommand"):
        assert label in msc, f"MSC missing {label}"


def test_two_ues_prach_collision_resolved():
    """NCS=419 leaves two preambles: the UEs pick the same one, their
    PRACH bursts and Msg3 PUSCH subframes sum in the air, and 36.321
    contention resolution sorts it out — the loser re-runs RA and still
    attaches."""
    sim = MultiUeSim(CapstoneConfig(snr_db=12.0, seed=0, max_ttis=900,
                                    prach_ncs=419), n_ues=2)
    res = sim.run()
    assert res["registered"] == [True, True]
    assert res["echo_ok"] == [True, True]
    evts = [e for _, e in res["trace"]]
    assert any("LOST contention" in e or "collision/CRC-fail" in e
               or "re-RA" in e for e in evts), "no contention observed"
