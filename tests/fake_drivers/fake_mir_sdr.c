/* Test double for the SdrPlay mir_sdr API surface the framework binds
 * (sdr_receiver_dvb_t2_tpu/io/vendor.py :: SdrplayDevice).  Function
 * signatures follow the vendor header the reference ships
 * (/root/reference/src/sdrplay/mir_sdr.h); behavior is a miniature radio:
 *
 *   - mir_sdr_Init loads an interleaved little-endian int16 I/Q capture
 *     from the file named by $FAKE_MIR_SDR_CAPTURE (device-rate samples);
 *   - mir_sdr_ReadPacket serves it in samplesPerPacket chunks, applying
 *     the current gain reduction as an attenuation relative to the Init
 *     value and modelling retunes (mir_sdr_SetRf) as a phase-continuous
 *     baseband frequency shift — so the closed retune/AGC loops can be
 *     exercised against the real ctypes bindings without hardware;
 *   - capture exhausted -> mir_sdr_Fail (1), the stream-end signal.
 *
 * fake_mir_* getters expose the driver state for test assertions.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static short *cap = NULL;
static long cap_len = 0;      /* complex samples */
static long pos = 0;
static double rf_hz = 0.0, rf0_hz = 0.0, fs_hz = 9.2e6;
static int gr_db = 0, gr0_db = 0;
static double phase = 0.0;
static int spp = 504;
static int inits = 0, uninits = 0, released = 0;
static int dc_ctl = -1, iq_ctl = -1;

int mir_sdr_ApiVersion(float *version) { *version = 2.13f; return 0; }

int mir_sdr_DCoffsetIQimbalanceControl(unsigned int dc, unsigned int iq)
{
    dc_ctl = (int)dc;
    iq_ctl = (int)iq;
    return 0;
}

int mir_sdr_Init(int gRdB, double fsMHz, double rfMHz, int bwType,
                 int ifType, int *samplesPerPacket)
{
    const char *path = getenv("FAKE_MIR_SDR_CAPTURE");
    if (!path) return 1;
    FILE *f = fopen(path, "rb");
    if (!f) return 1;
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    free(cap);
    cap = (short *)malloc((size_t)bytes);
    if (fread(cap, 1, (size_t)bytes, f) != (size_t)bytes) {
        fclose(f);
        return 1;
    }
    fclose(f);
    cap_len = bytes / 4;
    pos = 0;
    phase = 0.0;
    rf_hz = rf0_hz = rfMHz * 1e6;
    fs_hz = fsMHz * 1e6;
    gr_db = gr0_db = gRdB;
    if (bwType != 8000 || ifType != 0) return 2; /* InvalidParam */
    *samplesPerPacket = spp;
    ++inits;
    return 0;
}

int mir_sdr_Uninit(void)
{
    free(cap);
    cap = NULL;
    ++uninits;
    return 0;
}

int mir_sdr_ReleaseDeviceIdx(void) { ++released; return 0; }

int mir_sdr_SetRf(double drfHz, int abs_, int syncUpdate)
{
    rf_hz = abs_ ? drfHz : rf_hz + drfHz;
    return 0;
}

int mir_sdr_SetGr(int gRdB, int abs_, int syncUpdate)
{
    gr_db = abs_ ? gRdB : gr_db + gRdB;
    return 0;
}

int mir_sdr_ReadPacket(short *xi, short *xq, unsigned int *firstSampleNum,
                       int *grChanged, int *rfChanged, int *fsChanged)
{
    if (!cap || pos >= cap_len) return 1; /* mir_sdr_Fail: capture done */
    *firstSampleNum = (unsigned int)pos;
    *grChanged = *rfChanged = *fsChanged = 0;
    /* LO moved up by (rf - rf0): the wanted channel appears shifted DOWN
     * at baseband by the same amount */
    double df = -(rf_hz - rf0_hz);
    double w = 2.0 * M_PI * df / fs_hz;
    float scale = powf(10.0f, (float)(gr0_db - gr_db) / 20.0f);
    for (int k = 0; k < spp; ++k) {
        float i = 0.0f, q = 0.0f;
        if (pos < cap_len) {
            i = (float)cap[2 * pos];
            q = (float)cap[2 * pos + 1];
            ++pos;
        }
        float c = cosf((float)phase), s = sinf((float)phase);
        phase += w;
        if (phase > M_PI) phase -= 2.0 * M_PI;
        if (phase < -M_PI) phase += 2.0 * M_PI;
        float oi = (i * c - q * s) * scale;
        float oq = (i * s + q * c) * scale;
        if (oi > 32767.f) oi = 32767.f;
        if (oi < -32768.f) oi = -32768.f;
        if (oq > 32767.f) oq = 32767.f;
        if (oq < -32768.f) oq = -32768.f;
        xi[k] = (short)lrintf(oi);
        xq[k] = (short)lrintf(oq);
    }
    return 0;
}

/* --- state getters for test assertions --- */
double fake_mir_get_rf(void) { return rf_hz; }
int fake_mir_get_gr(void) { return gr_db; }
int fake_mir_get_inits(void) { return inits; }
int fake_mir_get_uninits(void) { return uninits; }
int fake_mir_get_released(void) { return released; }
int fake_mir_get_dc_ctl(void) { return dc_ctl; }
int fake_mir_get_iq_ctl(void) { return iq_ctl; }
