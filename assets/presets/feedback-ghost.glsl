// Phosphor-ghosting pass built on PassFeedback0: blends the current frame
// with the previous frame's output of this same pass (the ping-pong
// feedback texture the reference allocates lazily in
// ShaderEngine.cpp:1280-1347 and swaps at frame end :1710-1718).
// BASELINE config 5 exercise: no shipped shader uses PassFeedback, so the
// framework carries its own.

#pragma parameter GHOST "Ghosting amount" 0.35 0.0 0.95 0.05

#if defined(VERTEX)

attribute vec4 VertexCoord;
attribute vec4 TexCoord;
varying vec2 vTexCoord;
uniform mat4 MVPMatrix;

void main()
{
    gl_Position = MVPMatrix * VertexCoord;
    vTexCoord = TexCoord.xy;
}

#elif defined(FRAGMENT)

#ifdef GL_ES
precision mediump float;
#endif

varying vec2 vTexCoord;
uniform sampler2D Texture;
uniform sampler2D PassFeedback0;

#ifdef PARAMETER_UNIFORM
uniform float GHOST;
#else
#define GHOST 0.35
#endif

void main()
{
    vec4 cur = texture2D(Texture, vTexCoord);
    vec4 prev = texture2D(PassFeedback0, vTexCoord);
    gl_FragColor = mix(cur, prev, GHOST);
}

#endif
