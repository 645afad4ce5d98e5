from lhotse_tpu.recipes.ami import download_ami, prepare_ami
from lhotse_tpu.recipes.aidatatang_200zh import (
    download_aidatatang_200zh, prepare_aidatatang_200zh)
from lhotse_tpu.recipes.aishell import download_aishell, prepare_aishell
from lhotse_tpu.recipes.eval2000 import prepare_eval2000
from lhotse_tpu.recipes.commonvoice import download_commonvoice, prepare_commonvoice
from lhotse_tpu.recipes.earnings22 import download_earnings22, prepare_earnings22
from lhotse_tpu.recipes.fleurs import download_fleurs, prepare_fleurs
from lhotse_tpu.recipes.gigaspeech import download_gigaspeech, prepare_gigaspeech
from lhotse_tpu.recipes.magicdata import download_magicdata, prepare_magicdata
from lhotse_tpu.recipes.icsi import download_icsi, prepare_icsi
from lhotse_tpu.recipes.librispeech import download_librispeech, prepare_librispeech
from lhotse_tpu.recipes.ljspeech import download_ljspeech, prepare_ljspeech
from lhotse_tpu.recipes.libritts import (
    download_libritts, download_librittsr, prepare_libritts, prepare_librittsr)
from lhotse_tpu.recipes.mls import prepare_mls
from lhotse_tpu.recipes.musan import download_musan, prepare_musan
from lhotse_tpu.recipes.peoples_speech import prepare_peoples_speech
from lhotse_tpu.recipes.primewords import download_primewords, prepare_primewords
from lhotse_tpu.recipes.spgispeech import download_spgispeech, prepare_spgispeech
from lhotse_tpu.recipes.stcmds import download_stcmds, prepare_stcmds
from lhotse_tpu.recipes.switchboard import download_and_untar, prepare_switchboard
from lhotse_tpu.recipes.tedlium import download_tedlium, prepare_tedlium
from lhotse_tpu.recipes.thchs_30 import download_thchs_30, prepare_thchs_30
from lhotse_tpu.recipes.timit import download_timit, prepare_timit
from lhotse_tpu.recipes.utils import manifests_exist, read_manifests_if_cached
from lhotse_tpu.recipes.vctk import download_vctk, prepare_vctk
from lhotse_tpu.recipes.wenet_speech import prepare_wenet_speech
from lhotse_tpu.recipes.voxceleb import (download_voxceleb1, download_voxceleb2, prepare_voxceleb)
from lhotse_tpu.recipes.yesno import download_yesno, prepare_yesno

__all__ = [
    "download_aishell", "download_aidatatang_200zh", "download_magicdata", "download_primewords",
    "download_spgispeech", "download_stcmds", "download_thchs_30", "download_ami",
    "download_commonvoice", "download_earnings22", "download_fleurs", "download_gigaspeech",
    "download_icsi", "download_librispeech", "download_ljspeech", "download_libritts",
    "download_librittsr", "download_musan", "download_tedlium", "download_timit", "download_vctk",
    "download_voxceleb1", "download_voxceleb2", "download_yesno", "manifests_exist",
    "prepare_aishell", "prepare_aidatatang_200zh", "prepare_magicdata", "prepare_peoples_speech",
    "prepare_primewords", "prepare_spgispeech", "prepare_stcmds", "prepare_thchs_30", "prepare_ami",
    "prepare_commonvoice", "prepare_eval2000", "prepare_earnings22", "prepare_fleurs",
    "prepare_gigaspeech", "prepare_mls", "prepare_icsi", "prepare_librispeech", "prepare_ljspeech",
    "prepare_libritts", "prepare_librittsr", "prepare_musan", "prepare_switchboard",
    "prepare_tedlium", "prepare_timit", "prepare_vctk", "prepare_voxceleb", "prepare_wenet_speech",
    "prepare_yesno", "read_manifests_if_cached"]

# --- round 2 recipe tranche ---
from lhotse_tpu.recipes.adept import download_adept, prepare_adept
from lhotse_tpu.recipes.aishell2 import prepare_aishell2
from lhotse_tpu.recipes.aishell3 import download_aishell3, prepare_aishell3
from lhotse_tpu.recipes.aishell4 import download_aishell4, prepare_aishell4
from lhotse_tpu.recipes.ali_meeting import download_ali_meeting, prepare_ali_meeting
from lhotse_tpu.recipes.audio_mnist import download_audio_mnist, prepare_audio_mnist
from lhotse_tpu.recipes.babel import prepare_single_babel_language
from lhotse_tpu.recipes.chime6 import download_chime6, prepare_chime6
from lhotse_tpu.recipes.cmu_arctic import download_cmu_arctic, prepare_cmu_arctic
from lhotse_tpu.recipes.cmu_kids import prepare_cmu_kids
from lhotse_tpu.recipes.daily_talk import download_daily_talk, prepare_daily_talk
from lhotse_tpu.recipes.dihard3 import prepare_dihard3
from lhotse_tpu.recipes.dipco import download_dipco, prepare_dipco
from lhotse_tpu.recipes.ears import download_ears, prepare_ears
from lhotse_tpu.recipes.earnings21 import download_earnings21, prepare_earnings21
from lhotse_tpu.recipes.fisher_english import prepare_fisher_english
from lhotse_tpu.recipes.heroico import download_heroico, prepare_heroico
from lhotse_tpu.recipes.hifitts import download_hifitts, prepare_hifitts
from lhotse_tpu.recipes.l2_arctic import prepare_l2_arctic
from lhotse_tpu.recipes.libricss import download_libricss, prepare_libricss
from lhotse_tpu.recipes.librilight import prepare_librilight
from lhotse_tpu.recipes.mdcc import download_mdcc, prepare_mdcc
from lhotse_tpu.recipes.mobvoihotwords import (download_mobvoihotwords, prepare_mobvoihotwords)
from lhotse_tpu.recipes.rir_noise import download_rir_noise, prepare_rir_noise
from lhotse_tpu.recipes.speechcommands import (download_speechcommands, prepare_speechcommands)
from lhotse_tpu.recipes.tedlium2 import download_tedlium2, prepare_tedlium2
from lhotse_tpu.recipes.voxconverse import download_voxconverse, prepare_voxconverse
from lhotse_tpu.recipes.voxpopuli import download_voxpopuli, prepare_voxpopuli
from lhotse_tpu.recipes.wham import download_wham, prepare_wham

# --- round 2 recipe tranche 3 ---
from lhotse_tpu.recipes.baker_zh import download_baker_zh, prepare_baker_zh
from lhotse_tpu.recipes.cdsd import prepare_cdsd
from lhotse_tpu.recipes.kespeech import prepare_kespeech
from lhotse_tpu.recipes.speechio import prepare_speechio
from lhotse_tpu.recipes.tal_asr import prepare_tal_asr
from lhotse_tpu.recipes.tal_csasr import prepare_tal_csasr
from lhotse_tpu.recipes.wenetspeech4tts import prepare_wenetspeech4tts
from lhotse_tpu.recipes.xbmu_amdo31 import download_xbmu_amdo31, prepare_xbmu_amdo31
from lhotse_tpu.recipes.callhome_egyptian import prepare_callhome_egyptian
from lhotse_tpu.recipes.callhome_english import prepare_callhome_english
from lhotse_tpu.recipes.fisher_spanish import prepare_fisher_spanish
from lhotse_tpu.recipes.gale_arabic import prepare_gale_arabic
from lhotse_tpu.recipes.gale_mandarin import prepare_gale_mandarin
from lhotse_tpu.recipes.mgb2 import download_mgb2, prepare_mgb2
from lhotse_tpu.recipes.aspire import prepare_aspire
from lhotse_tpu.recipes.atcosim import download_atcosim, prepare_atcosim
from lhotse_tpu.recipes.broadcast_news import prepare_broadcast_news
from lhotse_tpu.recipes.grid import download_grid, prepare_grid
from lhotse_tpu.recipes.medical import download_medical, prepare_medical
from lhotse_tpu.recipes.slu import prepare_slu
from lhotse_tpu.recipes.this_american_life import (
    download_this_american_life, prepare_this_american_life)
from lhotse_tpu.recipes.uwb_atcc import download_uwb_atcc, prepare_uwb_atcc
from lhotse_tpu.recipes.cmu_indic import download_cmu_indic, prepare_cmu_indic
from lhotse_tpu.recipes.cslu_kids import prepare_cslu_kids
from lhotse_tpu.recipes.librimix import download_librimix, prepare_librimix
from lhotse_tpu.recipes.librimix_mini import download_librimix_mini, prepare_librimix_mini
from lhotse_tpu.recipes.librispeechmix import (
    download_librispeechmix, prepare_librispeechmix)
from lhotse_tpu.recipes.spatial_librispeech import (
    download_spatial_librispeech, prepare_spatial_librispeech)
from lhotse_tpu.recipes.bengaliai_speech import prepare_bengaliai_speech
from lhotse_tpu.recipes.but_reverb_db import download_but_reverb_db, prepare_but_reverb_db
from lhotse_tpu.recipes.edacc import download_edacc, prepare_edacc
from lhotse_tpu.recipes.himia import download_himia, prepare_himia
from lhotse_tpu.recipes.icmcasr import prepare_icmcasr
from lhotse_tpu.recipes.ksponspeech import prepare_ksponspeech
from lhotse_tpu.recipes.oto_speech import download_oto_speech, prepare_oto_speech
from lhotse_tpu.recipes.radio import prepare_radio
from lhotse_tpu.recipes.reazonspeech import download_reazonspeech, prepare_reazonspeech
from lhotse_tpu.recipes.bvcc import download_bvcc, prepare_bvcc
from lhotse_tpu.recipes.emilia import prepare_emilia
from lhotse_tpu.recipes.gigaspeech2 import prepare_gigaspeech2
from lhotse_tpu.recipes.gigast import download_gigast, prepare_gigast
from lhotse_tpu.recipes.iwslt22_ta import download_iwslt22_ta, prepare_iwslt22_ta
from lhotse_tpu.recipes.mtedx import download_mtedx, prepare_mtedx
from lhotse_tpu.recipes.must_c import prepare_must_c
from lhotse_tpu.recipes.notsofar1 import download_notsofar1, prepare_notsofar1
from lhotse_tpu.recipes.csj import concat_csj_supervisions, prepare_csj
from lhotse_tpu.recipes.nsc import prepare_nsc
from lhotse_tpu.recipes.sbcsae import download_sbcsae, prepare_sbcsae
