"""Capstone integration: the whole stack over the air in one run.

Reference parity: the nos1 oaisim flow — oaisim.c per-TTI loop carrying
RRC/NAS through the emulated PHY (oaisim.c:760-938), rrc_eNB.c CCCH/DCCH,
s1ap_eNB_nas_procedures.c, SGW user plane. One test climbs: cold
PSS/SSS/PBCH sync -> SIB1/SIB2 via DCI 1C -> PRACH -> RAR -> Msg3
RRCConnectionRequest through MAC/CCCH on the granted PUSCH -> Msg4 with
contention-resolution CE -> SetupComplete + NAS attach through RLC-AM on
SRB1 -> auth/SMC/AttachAccept -> DRB (RLC-UM + PDCP) -> one IP packet
UE->eNB->GTP-U->SGW echoed back, with pcap + MSC artifacts.
"""
import numpy as np

from openair4g_tpu.sim.capstone import FullStackSim, CapstoneConfig
from openair4g_tpu.utils.opt import read_pcap, KIND_MAC, KIND_IP, \
    DIR_DL, DIR_UL


def test_full_stack_over_the_air(tmp_path):
    sim = FullStackSim(CapstoneConfig(snr_db=12.0, seed=0),
                       artifact_dir=str(tmp_path))
    res = sim.run()

    # the ladder completed
    assert res["registered"], "UE NAS did not reach REGISTERED"
    assert res["mme_registered"], "MME did not see AttachComplete"
    assert res["rrc_connected"]
    assert res["echo_ok"], "IP echo did not traverse the user plane"
    assert res["ue_ip"] != 0
    # AS security: SMC rode SRB1 over the PHY, MAC-I verified both ways
    assert res["as_secured"], "eNB never saw SecurityModeComplete"
    assert res["srb_integrity_on"]
    assert res["srb_int_failures"] == 0
    events = [ev for _, ev in res["trace"]]
    assert next(i for i, e in enumerate(events)
                if "SecurityModeCommand" in e) < \
        next(i for i, e in enumerate(events) if "AS security activated" in e)
    # everything went over the PHY: sync + SIBs + RA + NAS + data
    assert res["phy_runs"]["prach"] >= 1
    assert res["phy_runs"]["dl"] >= 10
    assert res["phy_runs"]["ul"] >= 5

    # ladder ordering from the trace
    t = {ev: tti for tti, ev in
         [(tti, ev.split(" (")[0].split(":")[0]) for tti, ev in
          res["trace"]]}

    def first(substr):
        hits = [tti for tti, ev in res["trace"] if substr in ev]
        assert hits, f"missing trace event {substr!r}"
        return hits[0]

    assert first("UE camped") <= first("received SI")
    assert first("received SI") < first("sent PRACH")
    assert first("sent PRACH") <= first("detected preamble")
    assert first("detected preamble") < first("matched RAR")
    assert first("matched RAR") < first("Msg3 -> C-RNTI")
    assert first("Msg3 -> C-RNTI") <= first("won contention resolution")
    assert first("won contention") < first("forwarding initial NAS")
    assert first("forwarding initial NAS") < first("DRB established")
    assert first("DRB established") <= first("queued uplink IP packet")
    assert first("queued uplink IP") < first("received IP packet")
    del t

    # artifacts: pcap with MAC PDUs both directions + the IP packet
    recs = read_pcap(str(tmp_path / "capstone.pcap"))
    assert len(recs) >= 10
    kinds = {(k, d) for _, k, d, _, _ in recs}
    assert (KIND_MAC, DIR_UL) in kinds and (KIND_MAC, DIR_DL) in kinds
    assert any(k == KIND_IP for _, k, _, _, _ in recs)
    # the Msg3 MAC PDU is in the capture and starts with a CCCH subheader
    ul_macs = [p for _, k, d, _, p in recs
               if k == KIND_MAC and d == DIR_UL]
    assert any(p[0] & 0x1F == 0 for p in ul_macs)   # LCID 0 = CCCH

    # MSC chart covers RRC + S1AP + user plane
    msc = (tmp_path / "capstone.msc").read_text()
    for label in ("PRACH", "RRCConnectionRequest", "InitialUEMessage",
                  "DownlinkNASTransport", "GTP-U"):
        assert label in msc, f"MSC missing {label}"


def test_capstone_big_nas_segmentation():
    """A 450-byte DL NAS message (EMM INFORMATION) over the air: larger
    than any MAC grant, so it must cross SRB1 as several RLC-AM PDUs
    (LI framing + size-fitted segmentation) and reassemble at the UE
    (VERDICT r3 item 6 acceptance; rlc_am_segment.c parity)."""
    sim = FullStackSim(CapstoneConfig(snr_db=12.0, seed=3,
                                      big_nas_bytes=450, max_ttis=600))
    res = sim.run()
    assert res["registered"] and res["echo_ok"]
    assert res["big_nas_ok"], "oversized NAS did not reassemble"
    # it really took multiple PDUs: the DlInformationTransfer is ~470B
    # while the dedicated grant is ~100B
    tbs = sim.dl.codec(sim.cfg.ded).cfg.tbs // 8
    assert tbs < 250, tbs
