# Dev harness: pointwise RHS parity + end-to-end N1/N2 comparison vs reference.
import sys, os
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, '/root/reference')
sys.path.insert(0, '/root/repo')
import matplotlib; matplotlib.use('Agg')
import numpy as np

import rmt_tpu
from rmt_tpu.models import homo

sys.path.insert(0, '/root/repo/tests')
from dme_case import make_model_input

model_input = make_model_input(model="N1", process_type="non-iso-thermal")

# ---- our RHS at the initial state vs reference modelEquationN1 ----
spec = homo.build_spec(model_input)
p = homo.build_params(model_input)
d = jax.jit(lambda p: homo.feed_state(spec, p))(p)
y0 = np.asarray(homo.n1_initial_state(spec, p, d))
rhs = homo.make_n1_rhs(spec)
ours0 = np.asarray(rhs(0.0, y0, p, d))

# reference RHS: build paramsSet the way runN1 does
from PyREMOT.docs.pbHomoReactor import PackedBedHomoReactorClass
from PyREMOT.docs.rmtUtility import rmtUtilityClass as rmtUtil
from PyREMOT.docs.rmtThermo import *
from PyREMOT.docs.gasTransPor import calGasViscosity, calMixturePropertyM1
import PyREMOT.core.constants as CONST

compList = model_input['feed']['components']['shell']
compNo = len(compList)
P = model_input['operating-conditions']['pressure']
T = model_input['operating-conditions']['temperature']
processType = model_input['operating-conditions']['process-type']
ReSpec = model_input['reactor']
ReInDi = ReSpec['ReInDi']; ReLe = ReSpec['ReLe']
CrSeAr = CONST.PI_CONST*(ReInDi**2)/4
VoFlRa0 = model_input['feed']['volumetric-flowrate']
SpCoi0 = 1*np.array(model_input['feed']['concentration'])
SpCo0 = np.sum(SpCoi0)
SuGaVe0 = VoFlRa0/CrSeAr
MoFri0 = np.array(rmtUtil.moleFractionFromConcentrationSpecies(SpCoi0))
from PyREMOT.data.componentData import componentDataSource
internalData = [item for c in compList for item in componentDataSource if item['symbol']==c]
MoWei = [item['MW'] for item in internalData]
ExHe = model_input['external-heat']
GaVii0 = calGasViscosity(compList, T)
GaMiVi = calMixturePropertyM1(compNo, GaVii0, MoFri0, np.array(MoWei))
GaCpMeanList0 = calMeanHeatCapacityAtConstantPressure(compList, T)
GaCpMeanMix0 = calMixtureHeatCapacityAtConstantPressure(MoFri0, GaCpMeanList0)
MiMoWe0 = rmtUtil.mixtureMolecularWeight(MoFri0, np.array(MoWei), "kg/mol")
GaDe0 = calDensityIG(MiMoWe0, SpCo0)
Cif = np.copy(SpCoi0); Cf = SpCo0; Tf = T; Pf = P; vf = SuGaVe0; zf = ReLe
Cpif = np.copy(GaCpMeanList0); Cpf = GaCpMeanMix0
_Cif = np.repeat(np.max(Cif), compNo)
GaMaCoTe0 = (vf/zf)*_Cif
GaHeCoTe0 = (GaDe0*vf*Tf*(Cpf/MiMoWe0)/zf)
reactionList = rmtUtil.buildReactionList(model_input['reactions'])
reactionListSorted = rmtUtil.buildReactionCoefficient(model_input['reactions'])
reactionStochCoeff = rmtUtil.buildReactionCoeffVector(reactionListSorted)
StHeRe25 = np.array(list(map(calStandardEnthalpyOfReaction, reactionList)))
varNo = compNo + 2 if processType != 'iso-thermal' else compNo+1
FunParam = {
    "compList": compList,
    "const": {"CrSeAr": CrSeAr, "MoWei": MoWei, "StHeRe25": StHeRe25, "GaMiVi": GaMiVi, "varNo": varNo},
    "ReSpec": ReSpec,
    "ExHe": {"OvHeTrCo": ExHe['OvHeTrCo'], "EfHeTrAr": 4/ReInDi, "MeTe": ExHe['MeTe']},
    "constBC1": {"VoFlRa0": VoFlRa0, "SpCoi0": SpCoi0, "SpCo0": SpCo0, "P0": P, "T0": T,
                 "GaDe0": GaDe0, "GaCpMeanMix0": GaCpMeanMix0},
    "reactionRateExpr": model_input['reaction-rates'],
}
DimensionlessAnalysisParams = {"Cif": Cif, "Cf": Cf, "Tf": Tf, "Pf": Pf, "vf": vf, "zf": zf,
                               "Cpif": Cpif, "Cpf": Cpf, "GaMaCoTe0": GaMaCoTe0, "GaHeCoTe0": GaHeCoTe0}
odeSolverParams = {"timesLength": 100}
paramsSet = (reactionListSorted, reactionStochCoeff, FunParam, DimensionlessAnalysisParams, odeSolverParams, processType)
ref0 = np.asarray(PackedBedHomoReactorClass.modelEquationN1(0.0, y0, paramsSet))
print("RHS@y0 rel err:", np.max(np.abs(ours0-ref0)/np.maximum(np.abs(ref0), 1e-30)))

# random perturbed states
rng = np.random.default_rng(0)
worst = 0.0
for k in range(10):
    y = y0 * rng.uniform(0.5, 1.5, size=y0.shape)
    y[-1] = rng.uniform(-0.02, 0.08)
    r_ref = np.asarray(PackedBedHomoReactorClass.modelEquationN1(0.3, y, paramsSet))
    r_our = np.asarray(rhs(0.3, y, p, d))
    rel = np.max(np.abs(r_our-r_ref)/np.maximum(np.abs(r_ref), 1e-12))
    worst = max(worst, rel)
print("RHS random-states worst rel err:", worst)
