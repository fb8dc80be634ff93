"""Shared fixture netlists.

These are the reference's test-fixture netlists (data defining the parity
contract, cited per fixture) plus a few new ones exercising paths the
reference leaves untested.
"""

# tests/basics/basics01.test.ts:4-13 (also README.md demo)
BASICS01_AC = """
Demo of a simple AC circuit

v1 1 0 dc 0 ac 1
r1 1 2 30
c1 2 0 100u
.ac dec 100 1 100

.end
"""

# tests/transient/transient01.test.ts:14-24
RC_PULSE = """
* RC circuit with a pulse source

V1 1 0 PULSE(0 5 0 1n 1n 5u 10u)
R1 1 2 1k
C1 2 0 1u

.tran 0.1u 20u

.end
"""

# tests/transient/two-probes.test.ts:10-21
TWO_PROBES = """
* RC circuit with a pulse source and two probes

V1 1 0 PULSE(0 5 0 1n 1n 5u 10u)
R1 1 2 1k
C1 2 0 1u
.PRINT TRAN V(1) V(2)

.tran 0.1u 20u

.end
"""

# tests/transient/boost-converter-probe.test.ts:15-29
BOOST_CONVERTER = """
* Circuit JSON to SPICE Netlist
.MODEL D D
.MODEL SWMOD SW
LL1 N1 N2 1
DD1 N2 N3 D
CC1 N3 0 10U
RR1 N3 0 1K
SM1 N2 0 N4 0 SWMOD
Vsimulation_voltage_source_0 N1 0 DC 5
Vsimulation_voltage_source_1 N4 0 PULSE(0 10 0 1n 1n 0.00068 0.001)
.PRINT TRAN V(n1) V(n3)
.tran 0.001 0.1 uic
.END
"""

# tests/transient/diode-switch.test.ts:4-18
DIODE_SWITCH = """
* Diode and Switch test
.MODEL D D
.MODEL SWMOD SW
LL1 N1 N2 1
DD1 N2 N3 D
CC1 N3 0 10U
RR1 N3 0 1K
SM1 N2 0 N4 0 SWMOD
Vsimulation_voltage_source_0 N1 0 DC 5
Vsimulation_voltage_source_1 N4 0 PULSE(0 10 0 1n 1n 0.00068 0.001)
.tran 0.00001 0.01
.END
"""

# tests/transient/switch-vt-vh.test.ts:10-20
SWITCH_VT_VH = """
* Switch test with Vt and Vh model parameters
.MODEL SW_SW1 SW(Ron=0.1 Roff=1e9 Vt=2.5 Vh=0.1)
VCTRL_SW1 NCTRL_SW1 0 PULSE(0 5 0 1n 1n 0.0005 0.001)
SSW1 N1 N2 NCTRL_SW1 0 SW_SW1
RR1 N2 0 1K
Vsimulation_voltage_source_0 N1 0 DC 5
.PRINT TRAN V(n2) V(nctrl_sw1)
.tran 0.00001 0.004
.END
"""

# tests/transient/vswitch-pwl.test.ts:10-27
VSWITCH_PWL = """
* SPST switch between node OUT and ground, turns ON at 1ms, OFF at 3ms, ON at 7ms
V1    IN     0      DC 5
R1    IN     OUT    1k
C1    OUT    0      1u

* control waveform: 0V=OFF, 5V=ON at specific times
VCTRL CTRL   0      PWL(0 0   1m 5   3m 0   7m 5   9m 0)

* voltage-controlled switch: S <p> <n> <cp> <cn> <model>
S1    OUT    0      CTRL 0    SW
.model SW VSWITCH(Ron=1 Roff=1e9 Von=2 Voff=1)

.tran 0 10m
"""

# tests/transient/case-insensitive-nodes.test.ts:4-15
CASE_INSENSITIVE = """
* Case-insensitivity test for nodes and probes

V1 nOdE1 0 PULSE(0 5 0 1n 1n 5u 10u)
R1 NODE1 nOde2 1k
C1 node2 0 1u
.PRINT TRAN V(node1) V(NODE2)

.tran 0.1u 20u

.end
"""

# New: series RLC step response (analytic cross-check, no reference analog)
SERIES_RLC = """
* Series RLC step response
V1 in 0 PWL(0 0 1u 1 1 1)
R1 in n1 100
L1 n1 n2 10m
C1 n2 0 1u
.tran 1u 2m
.end
"""
